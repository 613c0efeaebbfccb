/*
 * Lives under org.apache.spark.sql.* because the expression-integration API
 * (ExpressionUtils.column / private[sql] expressions) is not public — the
 * established pattern for third-party native-expression packages. All
 * graft-facing entry points re-export from graft.* callers.
 */
package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, IntegralDivide, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.BinaryType

/** Column-form bridges to Catalyst expressions that have no public
  * `functions._` surface. */
object Internals {

  /** `a div b` — integral division without the SQL-string or
    * double-division detour (floor(a/b) on doubles silently corrupts
    * quotients past 2^53; this stays in long arithmetic). */
  def intDiv(a: Column, b: Column): Column =
    ExpressionUtils.column(new IntegralDivide(
      ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** Distributed bloom-filter build over a LONG key column (pre-hash keys
    * with `xxhash64`, mirroring Spark's own runtime-filter convention).
    * Aggregates partially map-side like any TypedImperativeAggregate; the
    * result is the serialized filter (≈ numBits/8 bytes), NOT the data. */
  def bloomAgg(keyHash: Column, expectedItems: Long, numBits: Long): Column =
    ExpressionUtils.column(new BloomFilterAggregate(
      ExpressionUtils.expression(keyHash),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** `might_contain(filter, keyHash)` with the filter embedded as a
    * constant — the form BloomFilterMightContain accepts outside the
    * optimizer's own scalar-subquery plumbing. False positives only;
    * callers re-verify with the real predicate/join. */
  def bloomMightContain(bloomBytes: Array[Byte], keyHash: Column): Column =
    ExpressionUtils.column(BloomFilterMightContain(
      Literal(bloomBytes, BinaryType), ExpressionUtils.expression(keyHash)))
}
