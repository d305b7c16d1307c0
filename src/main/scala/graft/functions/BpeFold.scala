package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native BPE kernels (the [[TokenSpans]] / [[Hash32Buckets]]
  * precedent, r17): the BPE train/apply paths were built on chained
  * higher-order functions — `aggregate` for the greedy merge fold
  * (one chained expression PER MERGE RULE in the apply path, with a
  * lineage checkpoint every 16 to bound expression depth), `transform
  * (sequence(...))` for the char split, `zip_with(slice, slice)` for
  * adjacent pairs. HOF lambdas never enter whole-stage codegen:
  * Catalyst walks the lambda interpreter per ELEMENT, and the fold
  * additionally materializes one intermediate accumulator array per
  * element per rule. These expressions run the same computations as
  * single tight JVM loops; outputs are element-for-element identical
  * to the HOF chains (BpeSpec / DocStreamSpec pin apply == retrain
  * and stream == batch on top of the oracle hash gate).
  */
object BpeFold {

  private[functions] val EMPTY = new GenericArrayData(Array.empty[Any])

  /** One greedy left-to-right merge pass, identical to the
    * `aggregate(syms, [], (acc, s) => ...)` fold it replaces: if the
    * accumulator's last symbol equals `lft` and the incoming symbol
    * equals `rgt`, replace the last with `merged`; else append. The
    * null semantics of the HOF fold (null symbol or rule side never
    * compares equal → plain append) are preserved explicitly.
    * Operates in place on a growable buffer; returns the new length.
    */
  private def foldOnce(buf: Array[UTF8String], len: Int,
      lft: UTF8String, rgt: UTF8String, merged: UTF8String): Int = {
    var out = 0
    var i = 0
    while (i < len) {
      val s = buf(i)
      if (out > 0 && s != null && buf(out - 1) != null &&
          lft != null && rgt != null &&
          buf(out - 1).equals(lft) && s.equals(rgt)) {
        buf(out - 1) = merged
      } else {
        buf(out) = s
        out += 1
      }
      i += 1
    }
    out
  }

  /** Apply every (lft, rgt) rule of `merges` in array order to the
    * symbol buffer — the chained-fold semantics of
    * [[graft.ops.Bpe.bpeEncodeWith]] exactly.
    */
  private def foldAllInto(buf: Array[UTF8String], len0: Int,
      merges: ArrayData): ArrayData = {
    var len = len0
    val k = merges.numElements()
    var m = 0
    while (m < k && len > 1) {
      val rule = merges.getStruct(m, 2)
      if (rule != null) {
        val lft = rule.getUTF8String(0)
        val rgt = rule.getUTF8String(1)
        val merged =
          if (lft == null || rgt == null) null
          else UTF8String.concat(lft, rgt)
        len = foldOnce(buf, len, lft, rgt, merged)
      }
      m += 1
    }
    val out = new Array[Any](len)
    var i = 0
    while (i < len) { out(i) = buf(i); i += 1 }
    new GenericArrayData(out)
  }

  /** array-of-symbols entry: `bpe_merge_fold_all(syms, merges)`. */
  def computeFold(syms: ArrayData, merges: ArrayData): ArrayData = {
    val n = syms.numElements()
    if (n == 0) return EMPTY
    val buf = new Array[UTF8String](n)
    var i = 0
    while (i < n) {
      buf(i) = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      i += 1
    }
    foldAllInto(buf, n, merges)
  }

  /** whole-word entry: `bpe_encode_word(word, merges)` — split the
    * word to its character symbols (code points, exactly like
    * `transform(sequence(1, length(word)), i -> substring(word, i,
    * 1))`) and fold every rule, one JVM call per word.
    */
  def computeWord(word: UTF8String, merges: ArrayData): ArrayData = {
    val s = word.toString
    val n = s.codePointCount(0, s.length)
    if (n == 0) return EMPTY
    val buf = new Array[UTF8String](n)
    var i = 0
    var off = 0
    while (i < n) {
      val next = s.offsetByCodePoints(off, 1)
      buf(i) = UTF8String.fromString(s.substring(off, next))
      off = next
      i += 1
    }
    foldAllInto(buf, n, merges)
  }

  /** `array_adj_pairs(syms)` — adjacent (lft, rgt) struct pairs of a
    * symbol array, identical to `zip_with(slice(syms, 1, n-1),
    * slice(syms, 2, n-1), (l, r) => struct(l, r))`.
    */
  def computePairs(syms: ArrayData): ArrayData = {
    val n = syms.numElements()
    if (n < 2) return EMPTY
    val out = new Array[Any](n - 1)
    var i = 0
    while (i < n - 1) {
      val l = if (syms.isNullAt(i)) null else syms.getUTF8String(i)
      val r = if (syms.isNullAt(i + 1)) null else syms.getUTF8String(i + 1)
      out(i) = new GenericInternalRow(Array[Any](l, r))
      i += 1
    }
    new GenericArrayData(out)
  }

  private[functions] val mergesType: DataType => Boolean = {
    case ArrayType(st: StructType, _) if st.length == 2 &&
      st.fields.forall(_.dataType == StringType) => true
    case _ => false
  }
}

/** `bpe_merge_fold_all(syms array<string>, merges array<struct<lft
  * string, rgt string>>)` → array<string>.
  */
case class BpeMergeFoldAll(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), m) if BpeFold.mergesType(m) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_merge_fold_all requires (array<string>, array<struct<string,string>>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_merge_fold_all"

  override def nullSafeEval(s: Any, m: Any): Any =
    BpeFold.computeFold(s.asInstanceOf[ArrayData], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (s, m) =>
      s"${ev.value} = graft.functions.BpeFold.computeFold($s, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeMergeFoldAll =
    copy(left = newLeft, right = newRight)
}

/** `bpe_encode_word(word string, merges array<struct<lft string, rgt
  * string>>)` → array<string> — char split + full merge fold in one
  * call.
  */
case class BpeEncodeWord(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (StringType, m) if BpeFold.mergesType(m) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bpe_encode_word requires (string, array<struct<string,string>>), got ($l, $r)")
    }
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "bpe_encode_word"

  override def nullSafeEval(w: Any, m: Any): Any =
    BpeFold.computeWord(w.asInstanceOf[UTF8String], m.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, m) =>
      s"${ev.value} = graft.functions.BpeFold.computeWord($w, $m);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeEncodeWord =
    copy(left = newLeft, right = newRight)
}

/** `array_adj_pairs(syms array<string>)` → array<struct<lft string,
  * rgt string>>.
  */
case class ArrayAdjPairs(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"array_adj_pairs requires (array<string>), got ($t)")
    }
  override def dataType: DataType = ArrayType(
    new StructType().add("lft", StringType, nullable = true)
      .add("rgt", StringType, nullable = true),
    containsNull = false)
  override def prettyName: String = "array_adj_pairs"

  override def nullSafeEval(s: Any): Any =
    BpeFold.computePairs(s.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.BpeFold.computePairs($s);")

  override protected def withNewChildInternal(newChild: Expression): ArrayAdjPairs =
    copy(child = newChild)
}
