package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Fused per-token hash-bucket computation for the model-serving folds
  * ([[graft.streaming.DocStream]]): per token, the first 4 bytes of
  * its MD5 digest as an unsigned 32-bit value ([[graft.text.Shingles
  * .hash32]]: `conv(substring(md5(t), 1, 8), 16, 10)` — the hashing
  * trick every trained model's bucket space is built on), mod `b`.
  * Returns one bucket per token (null token → null bucket, exactly
  * like the `md5(null)` chain it replaces).
  *
  * Why native: the serving folds computed this as
  * `transform(toks, t => hash32(t) % B)` — a higher-order function,
  * which Catalyst evaluates through the expression INTERPRETER (HOF
  * lambdas never enter whole-stage codegen), paying per-element
  * interpreter dispatch on top of the md5 itself. Measured on
  * q_nb_served at sf0.1: the interpreted hashing chain held the
  * serving fold at ~2.2× its batch twin even after the
  * [[NbClassSums]] scoring kernel landed. This expression runs the
  * whole token array in one tight JVM loop (thread-local
  * MessageDigest, no per-element dispatch); the digest bytes ARE the
  * md5 the SQL oracle computes, so results are bit-identical to the
  * transform chain (DocStreamSpec pins serving == batch on top).
  */
case class Hash32Buckets(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), LongType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"hash32_buckets requires (array<string> tokens, bigint mod), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "hash32_buckets"

  override def nullSafeEval(a: Any, b: Any): Any =
    Hash32Buckets.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (toks, mod) =>
      s"${ev.value} = graft.functions.Hash32Buckets.compute($toks, $mod);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Hash32Buckets =
    copy(left = newLeft, right = newRight)
}

object Hash32Buckets {
  private val digest =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** The whole-array kernel (shared by interpreted eval and codegen —
    * codegen emits a single call, the loop itself is plain JVM code).
    */
  def compute(toks: ArrayData, mod: Long): ArrayData = {
    val n = toks.numElements()
    val out = new Array[Any](n)
    val md = digest.get()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        md.reset()
        val d = md.digest(toks.getUTF8String(i).getBytes)
        // first 8 hex chars of the digest = first 4 bytes, unsigned
        val h = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        out(i) = java.lang.Long.valueOf(if (mod > 0) h % mod else h)
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}
