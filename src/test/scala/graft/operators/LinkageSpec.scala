package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import org.apache.spark.sql.functions._

class LinkageSpec extends AnyFunSuite with SparkSpec {

  test("linkPairs: candidates only within a block, canonical id_a < id_b, " +
      "score gate filters, lev rides along") {
    import spark.implicits._
    val df = Seq(
      (1L, "navy linen shirt", "B1"),
      (2L, "navy linen shirts", "B1"), // near-dup of 1, same block
      (3L, "crimson steel rod", "B1"), // same block, dissimilar
      (4L, "navy linen shirt", "B2")   // identical to 1 but other block
    ).toDF("id", "name", "brand")
    val out = Linkage.linkPairs(df, "id", "name", Seq("brand"), 0.9)
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"), r.getAs[Int]("lev")))
      .toSeq
    // only (1,2) survives: blocking excludes 4, the gate excludes 3,
    // and the canonical order emits each pair once with id_a < id_b
    assert(out == Seq((1L, 2L, 1)))
  }

  test("linkPairs refuses an unblocked self-join") {
    import spark.implicits._
    val df = Seq((1L, "a", "b")).toDF("id", "name", "brand")
    intercept[IllegalArgumentException] {
      Linkage.linkPairs(df, "id", "name", Nil, 0.9)
    }
  }
}
