/*
 * Lives under org.apache.spark.sql.* because the expression-integration API
 * it builds on (ExpressionUtils.column / AbstractDataType in ExpectsInputTypes)
 * is private[sql] — the established pattern for third-party native
 * expressions. All graft-facing entry points re-export from graft.operators.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, ExpressionDescription, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType}

/**
 * Native Catalyst expression: all MinHash signature minima of a token-hash
 * array in ONE traversal. `sigs[j] = min over h in arr of (as(j)*h + bs(j))
 * mod m` — exactly `array_min(transform(arr, h -> (a_j*h + b_j) % m))` for
 * every j at once.
 *
 * Why a custom Expression (SURVEY §2.10 preference order): the HOF
 * composition runs `seeds` separate `transform` passes, each allocating an
 * intermediate array the size of the token set per row, then `seeds`
 * `array_min` scans — and higher-order functions are CodegenFallback, so
 * every element crosses a lambda dispatch. For the dedup family this IS the
 * hot loop (the minhash map stage dominates the whole near-dup pipeline).
 * This expression compiles to one fused primitive loop — no intermediate
 * arrays, no lambda dispatch — inside the surrounding WholeStageCodegen span.
 *
 * Semantics match the HOF form exactly: same affine arithmetic in long math
 * (inputs are 40-bit hashes and 20-bit multipliers, so a*h+b < 2^61 — no
 * overflow), empty input array → NULL (as `array_min` of an empty array),
 * null ELEMENTS skipped (as `array_min` skips the nulls `transform`
 * propagates) — an all-null array is NULL like an empty one.
 */
@ExpressionDescription(
  usage = "minhash_sigs(arr) - per-seed affine-hash minima of a long array.")
case class MinHashSigs(child: Expression, as: Seq[Long], bs: Seq[Long], mod: Long)
    extends UnaryExpression with ExpectsInputTypes {

  require(as.nonEmpty && as.length == bs.length,
    "need one (a, b) pair per seed")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  // nullable even for a non-null child: empty arrays yield NULL (array_min
  // of an empty array is NULL in the unfused form this replaces)
  override def nullable: Boolean = true

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val k = as.length
    val mins = Array.fill(k)(mod) // residues are < mod, so mod > any min
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) { // skip nulls, as array_min does
        seen = true
        val h = arr.getLong(i)
        var j = 0
        while (j < k) {
          val v = (as(j) * h + bs(j)) % mod
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else UnsafeArrayData.fromPrimitiveArray(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", as.toArray, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", bs.toArray, "long[]")
    val k = as.length
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val mins = ctx.freshName("mins")
      val seen = ctx.freshName("seen")
      s"""
         |int $n = $c.numElements();
         |long[] $mins = new long[$k];
         |java.util.Arrays.fill($mins, ${mod}L);
         |boolean $seen = false;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) continue; // skip nulls, as array_min does
         |  $seen = true;
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($aRef[$j] * $h + $bRef[$j]) % ${mod}L;
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |if (!$seen) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($mins);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSigs =
    copy(child = newChild)
}

object MinHashSigs {
  /** Column form — usable without any registry. */
  def of(arr: Column, as: Seq[Long], bs: Seq[Long], mod: Long): Column =
    ExpressionUtils.column(
      MinHashSigs(ExpressionUtils.expression(arr), as, bs, mod))
}
