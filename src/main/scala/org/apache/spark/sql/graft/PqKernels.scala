/*
 * Lives under org.apache.spark.sql.* because the expression-integration API
 * it builds on (ExpressionUtils.column / AbstractDataType in ExpectsInputTypes)
 * is private[sql] — the established pattern for third-party native
 * expressions (see CosineSim.scala). Graft-facing entry points are the
 * `Column` builders on the companion objects.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, IntegerType, LongType}

/**
 * Native Catalyst expression: index of the nearest centroid (exact integer
 * squared L2, first index on ties) of a fixed-point BIGINT subvector
 * against a CONSTANT codebook — the inner loop of every PQ / IVF encode
 * pass in `graft.operators.Similarity`.
 *
 * Why a custom Expression (SURVEY §2.10 preference order): the HOF
 * composition `array_position(dists, array_min(dists)) - 1` over
 * `dists = array(aggregate(zip_with(sv, lit(c), (x,y) => (x-y)*(x-y)),
 * 0L, _+_): _*)` dispatches an interpreted lambda per ELEMENT per
 * CENTROID — k·dsub dispatches per row, ~20M for one corpus encode at
 * sf0.1, and it is the hot loop of `ext_embedding_pq_codes` /
 * `ext_embedding_pq_topk` / `ext_embedding_ivfpq_topk` /
 * `ext_embedding_pq_rerank`. This compiles to one fused primitive loop
 * over a flattened `long[]` codebook in the references array and stays
 * inside the surrounding WholeStageCodegen span.
 *
 * Numerics match the HOF composition bit-for-bit (PqKernelsSpec pins it,
 * ties included): exact long arithmetic, strict `<` update = first argmin,
 * exactly `array_position`'s first-occurrence rule. NULL input, a NULL
 * element, or a subvector whose length differs from the codebook's yields
 * NULL (the HOF form's null-propagation: a length mismatch nulls every
 * distance and `array_min` of all-null is null). Long overflow wraps where
 * the ANSI HOF form would throw — unreachable for ×2^16 fixed-point unit
 * vectors by ~2^23 margin.
 */
@ExpressionDescription(
  usage = "pq_argmin(sv) - index of the nearest constant centroid (exact integer L2).")
case class PqArgmin(child: Expression, cents: Seq[Seq[Long]])
    extends UnaryExpression with ExpectsInputTypes {

  require(cents.nonEmpty && cents.forall(_.length == cents.head.length),
    "codebook must be non-empty and rectangular")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = IntegerType
  // nullable even for non-null children: length mismatch / null element
  override def nullable: Boolean = true

  @transient private lazy val flat: Array[Long] = cents.flatten.toArray
  private def k: Int = cents.length
  private def dsub: Int = cents.head.length

  override protected def nullSafeEval(a: Any): Any = {
    val sv = a.asInstanceOf[ArrayData]
    if (sv.numElements() != dsub) return null
    var i = 0
    while (i < dsub) {
      if (sv.isNullAt(i)) return null
      i += 1
    }
    var best = 0L
    var bestIdx = -1
    var j = 0
    while (j < k) {
      var d = 0L
      var i2 = 0
      while (i2 < dsub) {
        val diff = sv.getLong(i2) - flat(j * dsub + i2)
        d += diff * diff
        i2 += 1
      }
      if (bestIdx < 0 || d < best) { best = d; bestIdx = j }
      j += 1
    }
    bestIdx
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cb = ctx.addReferenceObj("pqCents", flat, "long[]")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val d = ctx.freshName("d")
      val diff = ctx.freshName("diff")
      val best = ctx.freshName("best")
      val bestIdx = ctx.freshName("bestIdx")
      val bad = ctx.freshName("bad")
      s"""
         |if ($a.numElements() != $dsub) {
         |  ${ev.isNull} = true;
         |} else {
         |  boolean $bad = false;
         |  for (int $i = 0; $i < $dsub; $i++) {
         |    if ($a.isNullAt($i)) { $bad = true; break; }
         |  }
         |  if ($bad) {
         |    ${ev.isNull} = true;
         |  } else {
         |    long $best = 0L; int $bestIdx = -1;
         |    for (int $j = 0; $j < $k; $j++) {
         |      long $d = 0L;
         |      for (int $i = 0; $i < $dsub; $i++) {
         |        long $diff = $a.getLong($i) - $cb[$j * $dsub + $i];
         |        $d += $diff * $diff;
         |      }
         |      if ($bestIdx < 0 || $d < $best) { $best = $d; $bestIdx = $j; }
         |    }
         |    ${ev.value} = $bestIdx;
         |  }
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): PqArgmin =
    copy(child = c)
}

object PqArgmin {
  /** Column form — usable without any registry. */
  def apply(sv: Column, cents: Array[Array[Long]]): Column =
    ExpressionUtils.column(
      PqArgmin(ExpressionUtils.expression(sv),
        cents.toIndexedSeq.map(_.toIndexedSeq)))
}

/**
 * Native Catalyst expression: exact squared L2 between two BIGINT arrays —
 * the per-PAIR scoring kernel of the exact/rerank ANN paths
 * (`ext_cosine_topk`'s fixed-point siblings: `ext_embedding_pq_rerank`'s
 * refine join, `ext_mrl_overlap`, `ext_hard_negatives`). The HOF form
 * `aggregate(zip_with(a, b, (x,y) => (x-y)*(x-y)), 0L, _+_)` dispatches
 * two interpreted lambdas per element per PAIR — |queries|·|corpus|·dims
 * dispatches for a brute-force pass. One fused primitive loop instead.
 *
 * Numerics are bit-equal (PqKernelsSpec): exact long arithmetic,
 * left-to-right, NULL on length mismatch (zip_with pads the shorter side
 * with nulls and the aggregate sum absorbs them into NULL) and NULL on any
 * NULL element. Long overflow wraps where ANSI would throw — unreachable
 * for fixed-point unit vectors.
 */
@ExpressionDescription(
  usage = "sq_dist_long(a, b) - exact squared L2 between two bigint vectors.")
case class SqDistLong(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(LongType), ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (xs.isNullAt(i) || ys.isNullAt(i)) return null
      val diff = xs.getLong(i) - ys.getLong(i)
      acc += diff * diff
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val diff = ctx.freshName("diff")
      val bad = ctx.freshName("bad")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $acc = 0L; boolean $bad = false;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { $bad = true; break; }
         |    long $diff = $a.getLong($i) - $b.getLong($i);
         |    $acc += $diff * $diff;
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $acc; }
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): SqDistLong =
    copy(left = l, right = r)
}

object SqDistLong {
  /** Column form — usable without any registry. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      SqDistLong(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
