package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused per-document adjacent-token bigram construction:
  * `token_pairs(text)` returns one array<struct<prev string, term
  * string>> element per adjacent pair of the space-split,
  * empty-filtered token sequence — the [[TokenSpans]] kernel shape at
  * n = 2 with the two halves kept as separate struct fields (the NLL
  * scorers key their count tables on (prev, term), so a joined span
  * string would just be re-split downstream).
  *
  * Why native (the [[TokenSpans]] precedent, r16 verdict #3 → r17):
  * the bigram stream behind q_bigram_nll / q_kn_bigram_nll was built
  * from indexed `transform` + `get` higher-order functions — zero
  * exchanges, but HOF lambdas never enter whole-stage codegen, so
  * Catalyst walked the lambda interpreter per element and the
  * exchange win roughly cancelled against the interpreter loss
  * (q_bigram_nll 0.92× in r16). This expression runs the whole
  * document in one tight JVM loop; the produced (prev, term) multiset
  * is bit-identical to the HOF chain (adjacent pairs of the FILTERED
  * token array — the exact pairs the lag-window form emitted, since
  * its pos2 = pos + 1 guard only ever dropped pairs spanning filtered
  * empty tokens, which the corpus tokenization rule never produces),
  * so every downstream oracle hash is unchanged.
  */
case class TokenPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"token_pairs requires (string text), got ($t)")
    }
  override def dataType: DataType = ArrayType(
    new StructType().add("prev", StringType, nullable = false)
      .add("term", StringType, nullable = false),
    containsNull = false)
  override def prettyName: String = "token_pairs"

  override def nullSafeEval(t: Any): Any =
    TokenPairs.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.TokenPairs.compute($t);")

  override protected def withNewChildInternal(newChild: Expression): TokenPairs =
    copy(child = newChild)
}

object TokenPairs {
  private val EMPTY = new GenericArrayData(Array.empty[Any])

  /** Whole-document kernel (shared by interpreted eval and codegen).
    * Split semantics mirror Spark's `split(text, " ")` with limit -1;
    * empty tokens are filtered before pairing, exactly like the
    * `filter(split(..), t => t =!= "")` chain this replaces.
    */
  def compute(text: UTF8String): ArrayData = {
    val raw = text.toString.split(" ", -1)
    var m = 0
    var i = 0
    while (i < raw.length) { if (!raw(i).isEmpty) m += 1; i += 1 }
    if (m < 2) return EMPTY
    val toks = new Array[UTF8String](m)
    var j = 0
    i = 0
    while (i < raw.length) {
      if (!raw(i).isEmpty) { toks(j) = UTF8String.fromString(raw(i)); j += 1 }
      i += 1
    }
    val out = new Array[Any](m - 1)
    i = 0
    while (i < m - 1) {
      out(i) = new GenericInternalRow(Array[Any](toks(i), toks(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }
}
