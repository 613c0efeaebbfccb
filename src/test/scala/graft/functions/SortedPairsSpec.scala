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
}
