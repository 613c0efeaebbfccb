/*
 * Lives under org.apache.spark.sql.* because the expression-integration API
 * it builds on (ExpressionUtils.column / AbstractDataType in ExpectsInputTypes)
 * is private[sql] — the established pattern for third-party native
 * expressions. All graft-facing entry points re-export from graft.functions.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, ExpressionDescription}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}

/**
 * Native Catalyst expression: cosine similarity of two `array<float>`
 * columns, with whole-stage codegen (`doGenCode`).
 *
 * Why a custom Expression (SURVEY §2.10 preference order): the built-in
 * composition `aggregate(zip_with(a, b, _*_), 0d, _+_)` materializes an
 * intermediate array per row-pair and dispatches a lambda per element. For a
 * brute-force scan doing |queries|×|candidates| similarity evaluations,
 * that's the hot loop of the whole operator. This expression compiles to a
 * single fused primitive loop — no allocation, no lambda dispatch — and
 * stays inside the surrounding WholeStageCodegen span.
 *
 * Numerics match the HOF composition bit-for-bit: elements promote
 * float→double, products accumulate left-to-right, result =
 * dot / (sqrt(norm_a) * sqrt(norm_b)) — so oracle-checked results are
 * unchanged when swapped in. Unequal-length inputs yield NULL, again
 * matching the HOF form (zip_with null-pads the shorter array and the
 * aggregate sum absorbs the null).
 */
@ExpressionDescription(
  usage = "cosine_sim(a, b) - cosine similarity of two float vectors (double).")
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] =
    Seq(ArrayType(FloatType), ArrayType(FloatType))

  override def dataType: DataType = DoubleType

  // nullable even when both children are non-null: unequal lengths → NULL
  override def nullable: Boolean = true

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val ys = b.asInstanceOf[ArrayData]
    val n = xs.numElements()
    if (n != ys.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = xs.getFloat(i).toDouble
      val y = ys.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $x = (double) $a.getFloat($i);
         |    double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSim =
    copy(left = l, right = r)
}

object CosineSim {
  /** Column form — usable without any registry. */
  def apply(a: Column, b: Column): Column =
    ExpressionUtils.column(
      CosineSim(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
