package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Fused per-class likelihood accumulation for the Naive-Bayes serving
  * scorer ([[graft.streaming.DocStream.classifyOnIngest]]): given a
  * document's hashed token buckets `bks` (array<bigint>), the model's
  * DENSE slot-addressed micro-log-likelihood array `lam`
  * (array<bigint>, slot = bucket·C + classIdx) and the class count
  * `C`, returns an array<bigint> of length C with
  * sums[i] = Σ_bk lam[bk·C + i] — every class's token-likelihood total
  * in ONE codegen'd pass over the tokens.
  *
  * This is the NB serving hot path: the interpreted
  * `aggregate(transform(sequence(...)))` HOF chain it replaces
  * re-walked the token array once per class through the expression
  * interpreter (measured residual: q_nb_served 3.7–7.3 s vs 2.0 s for
  * the batch-join twin at sf0.1 AFTER the dense-array fix — r10
  * verdict missing-piece #1). The per-token inner loop here walks C
  * CONTIGUOUS slots of `lam` (the dense layout's point), and the tiny
  * C-element argmax stays in SQL where struct-ordering tie-breaks are
  * already pinned. Same design rationale as [[AdcScoreLong]] /
  * [[ArrayDotLong]].
  *
  * Semantics (identical interpreted and codegen): integer sums —
  * exact, order-free, the SQL oracle's grouped BIGINT sum matches
  * bit-for-bit; a null bucket, an out-of-range slot, or a null `lam`
  * entry contributes 0 (never happens with a [[graft.ops.Classify
  * .nbModel]]-built model, whose slots are dense and pre-filled);
  * C <= 0 returns an empty array.
  */
case class NbClassSums(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _), IntegerType) =>
        TypeCheckResult.TypeCheckSuccess
      case (a, b, c) => TypeCheckResult.TypeCheckFailure(
        s"nb_class_sums requires (array<bigint> buckets, array<bigint> lam, " +
          s"int n_classes), got ($a, $b, $c)")
    }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "nb_class_sums"

  override def nullSafeEval(a: Any, b: Any, c: Any): Any = {
    val bks = a.asInstanceOf[ArrayData]
    val lam = b.asInstanceOf[ArrayData]
    val nc = c.asInstanceOf[Int]
    if (nc <= 0) return new GenericArrayData(Array.empty[Long])
    val sums = new Array[Long](nc)
    val n = bks.numElements()
    val len = lam.numElements()
    var t = 0
    while (t < n) {
      if (!bks.isNullAt(t)) {
        val base = bks.getLong(t) * nc
        var i = 0
        while (i < nc) {
          val s = base + i
          if (s >= 0 && s < len && !lam.isNullAt(s.toInt)) sums(i) += lam.getLong(s.toInt)
          i += 1
        }
      }
      t += 1
    }
    new GenericArrayData(sums)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (bks, lam, nc) => {
      val sums = ctx.freshName("sums")
      val n = ctx.freshName("n")
      val len = ctx.freshName("len")
      val t = ctx.freshName("t")
      val i = ctx.freshName("i")
      val base = ctx.freshName("base")
      val s = ctx.freshName("s")
      // same guards as nullSafeEval: slot range + null entries -> 0
      s"""
         |long[] $sums = new long[$nc > 0 ? $nc : 0];
         |int $n = $bks.numElements();
         |int $len = $lam.numElements();
         |for (int $t = 0; $t < $n; $t++) {
         |  if (!$bks.isNullAt($t)) {
         |    long $base = $bks.getLong($t) * $nc;
         |    for (int $i = 0; $i < $nc; $i++) {
         |      long $s = $base + $i;
         |      if ($s >= 0 && $s < $len && !$lam.isNullAt((int) $s)) {
         |        $sums[$i] += $lam.getLong((int) $s);
         |      }
         |    }
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($sums);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): NbClassSums =
    copy(first = newFirst, second = newSecond, third = newThird)
}
