package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fused ADC (Asymmetric Distance Computation) scoring kernel for the
  * product-quantization search ([[graft.ops.VectorOps.pqSearch]]):
  * given a vector's `codes` (array<int>, one code per subspace) and a
  * query's flattened lookup table `lut` (array<long>, laid out
  * [j·ksub + code] with ksub = lut.length / codes.length), returns
  * Σ_j lut[j·ksub + codes[j]] — the whole per-candidate score in one
  * codegen'd loop of m array reads.
  *
  * This IS the PQ hot path at scale: the scan does nothing per row but
  * this fold, so keeping it inside whole-stage codegen — instead of the
  * interpreted `aggregate(sequence(...))` higher-order chain it
  * replaced — keeps the scan I/O-bound rather than expression-
  * interpreter-bound. Same design rationale and measured HOF penalty
  * class as [[ArrayDotLong]] (its zip_with/aggregate form was ~10×
  * slower in the pair loop).
  *
  * Semantics: integer sums (exact, order-free — the SQL oracle's
  * grouped BIGINT sum is identical); a null or out-of-range code and a
  * null LUT entry contribute 0, consistent in interpreted and codegen
  * paths.
  */
case class AdcScoreLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(IntegerType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_score_long requires (array<int> codes, array<bigint> lut), got ($l, $r)")
    }
  override def dataType: DataType = LongType
  override def prettyName: String = "adc_score_long"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val codes = a.asInstanceOf[ArrayData]
    val lut = b.asInstanceOf[ArrayData]
    val m = codes.numElements()
    if (m == 0) return 0L
    val ksub = lut.numElements() / m
    var s = 0L
    var j = 0
    while (j < m) {
      // the range guard is per-subspace (0 <= code < ksub), not just a
      // global array-bounds check: a code in [ksub, …) must contribute
      // 0, never read an adjacent subspace's LUT entry
      if (!codes.isNullAt(j)) {
        val code = codes.getInt(j)
        if (code >= 0 && code < ksub && !lut.isNullAt(j * ksub + code)) {
          s += lut.getLong(j * ksub + code)
        }
      }
      j += 1
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (codes, lut) => {
      val m = ctx.freshName("m")
      val ksub = ctx.freshName("ksub")
      val j = ctx.freshName("j")
      val code = ctx.freshName("code")
      val s = ctx.freshName("s")
      // same per-subspace guard as nullSafeEval: 0 <= code < ksub
      s"""
         |int $m = $codes.numElements();
         |long $s = 0L;
         |if ($m > 0) {
         |  int $ksub = $lut.numElements() / $m;
         |  for (int $j = 0; $j < $m; $j++) {
         |    if (!$codes.isNullAt($j)) {
         |      int $code = $codes.getInt($j);
         |      if ($code >= 0 && $code < $ksub && !$lut.isNullAt($j * $ksub + $code)) {
         |        $s += $lut.getLong($j * $ksub + $code);
         |      }
         |    }
         |  }
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScoreLong =
    copy(left = newLeft, right = newRight)
}
