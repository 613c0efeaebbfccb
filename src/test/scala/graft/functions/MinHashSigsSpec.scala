package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.MinHashSigs
import graft.SparkSpec

/** The fused minhash expression's element semantics: null elements must be
  * SKIPPED exactly as `array_min(transform(...))` skips the nulls that
  * `transform` propagates — a null read as getLong(i)=0 would poison every
  * seed's minimum to b_j % mod. Interpreted and codegen paths both pinned. */
class MinHashSigsSpec extends AnyFunSuite with SparkSpec {

  private val as = Seq(3L, 5L)
  private val bs = Seq(7L, 11L)
  private val mod = 1L << 57

  private def sigsOf(arr: Column): Column = MinHashSigs.of(arr, as, bs, mod)

  /** The HOF reference form the expression replaces. */
  private def hofSigs(arr: Column): Column = array(
    as.zip(bs).map { case (a, b) =>
      array_min(transform(arr, h => (lit(a) * h + lit(b)) % lit(mod)))
    }: _*)

  test("null elements are skipped, matching the HOF form (both eval paths)") {
    val sq = spark
    import sq.implicits._
    val rows = Seq(
      (1L, Seq[java.lang.Long](10L, null, 40L)), // null mid-array
      (2L, Seq[java.lang.Long](null, null)),     // all-null → NULL result
      (3L, Seq[java.lang.Long]()),               // empty → NULL result
      (4L, Seq[java.lang.Long](25L))
    ).toDF("id", "arr")
    // codegen path (default)
    val fused = rows.select(col("id"), sigsOf(col("arr")).as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    val hof = rows.select(col("id"), hofSigs(col("arr")).as("s")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getSeq[Long](1)))
      .toMap
    assert(fused(1L) == Seq(3L * 10 + 7, 5L * 10 + 11),
      "minimum must come from the non-null elements only")
    assert(fused(1L) == hof(1L) && fused(4L) == hof(4L))
    assert(fused(2L) == null && fused(3L) == null,
      "all-null and empty arrays are NULL like array_min of an empty array")
    // interpreted path: evaluate the expression directly off-codegen
    val expr = MinHashSigs(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[java.lang.Long](10L, null, 40L),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true)),
      as, bs, mod)
    val out = expr.eval(null)
      .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData].toLongArray.toSeq
    assert(out == Seq(3L * 10 + 7, 5L * 10 + 11))
    val allNull = MinHashSigs(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq[java.lang.Long](null, null),
        org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType, containsNull = true)),
      as, bs, mod)
    assert(allNull.eval(null) == null)
  }
}
