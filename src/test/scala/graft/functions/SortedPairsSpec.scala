package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** Pins the native SortedPairs kernel element-for-element equal to the
  * HOF formulation it replaced in Graph.itemPairs' pair expansion. */
class SortedPairsSpec extends AnyFunSuite with SparkSpec {

  test("SortedPairs equals the flatten/transform/slice HOF chain on " +
      "random sorted arrays, including empty and singleton") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (0 until 60).map { i =>
      val n = i % 7 // includes 0 and 1 element arrays
      (i.toLong, (0 until n).map(_ => rnd.nextInt(50).toLong)
        .distinct.sorted)
    }
    val df = rows.toDF("id", "__items")
    val hof = df.select(col("id"), expr(
        "flatten(transform(__items, (x, i) -> " +
          "transform(slice(__items, i + 2, size(__items)), " +
          "y -> struct(x AS u, y AS v))))").as("p"))
      .select(col("id"), explode(col("p")).as("e"))
      .select(col("id"), col("e.u"), col("e.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val native = df.select(col("id"),
        explode(org.apache.spark.sql.graft.SortedPairs.of(col("__items")))
          .as("e"))
      .select(col("id"), col("e.u"), col("e.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(native == hof)
    // NULL array propagates to a NULL pair array (select, not explode)
    val withNull = Seq((1L, Seq(1L, 2L)), (2L, null))
      .toDF("id", "__items")
      .select(col("id"),
        org.apache.spark.sql.graft.SortedPairs.of(col("__items")).as("p"))
      .collect()
    assert(withNull.find(_.getLong(0) == 2L).get.isNullAt(1))
    assert(!withNull.find(_.getLong(0) == 1L).get.isNullAt(1))
  }

  test("array<int> input implicit-casts to array<long> (r13 advice: the " +
      "HOF chain accepted any orderable element type)") {
    import spark.implicits._
    val got = Seq((1, Seq(3, 1, 7))).toDF("id", "xs")
      .select(explode(org.apache.spark.sql.graft.SortedPairs.of(
        array_sort(col("xs")))).as("e"))
      .select(col("e.u"), col("e.v"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq.sorted
    assert(got == Seq((1L, 3L), (1L, 7L), (3L, 7L)))
  }

  test("Graph.itemPairs falls back to the HOF expansion for a STRING " +
      "item column, element-equal semantics") {
    import spark.implicits._
    val df = Seq((1L, "b"), (1L, "a"), (1L, "c"), (2L, "z"), (1L, "a"))
      .toDF("g", "item")
    val got = graft.operators.Graph.itemPairs(df, "g", "item")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq.sorted
    assert(got == Seq((1L, "a", "b"), (1L, "a", "c"), (1L, "b", "c")))
  }

  test("a hub group whose pair expansion exceeds Int.MaxValue fails with " +
      "the descriptive cap-upstream message, not NegativeArraySizeException") {
    import org.apache.spark.sql.catalyst.expressions.Literal
    import org.apache.spark.sql.types.{ArrayType, LongType}
    // n = 65537 → n(n-1)/2 = 2_147_516_416 > Int.MaxValue; the guard must
    // throw BEFORE allocating the output array
    val big = Literal.create((0L until 65537L).toArray, ArrayType(LongType))
    val e = intercept[IllegalArgumentException] {
      org.apache.spark.sql.graft.SortedPairs(big).eval(null)
    }
    assert(e.getMessage.contains("capped upstream"))
  }
}
