package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.SortedLongSet

/** Pins the native primitive-set aggregate element-equal to
  * `array_sort(collect_set(x))` — the form it replaces in the graph
  * pair-stream folds. */
class SortedLongSetSpec extends AnyFunSuite with SparkSpec {

  private def both(df: org.apache.spark.sql.DataFrame,
                   parts: Int): (Map[Long, Seq[Long]], Map[Long, Seq[Long]]) = {
    val d = df.repartition(parts)
    def fold(c: org.apache.spark.sql.Column) =
      d.groupBy(col("g")).agg(c.as("s")).collect()
        .map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    (fold(SortedLongSet.of(col("v"))),
      fold(array_sort(collect_set(col("v").cast("long")))))
  }

  test("equals array_sort(collect_set) — dups, zero, negatives, NULLs, " +
      "any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val rows = (1 to 5000).map { _ =>
      val g = rnd.nextInt(20).toLong
      val v: java.lang.Long = rnd.nextInt(10) match {
        case 0 => null
        case 1 => 0L
        case 2 => -rnd.nextInt(50).toLong
        case _ => rnd.nextInt(200).toLong
      }
      (g, v)
    }
    val df = rows.toDF("g", "v")
    for (parts <- Seq(1, 4, 32)) {
      val (got, want) = both(df, parts)
      assert(got == want, s"parts=$parts")
      // sorted ascending, distinct
      got.values.foreach { s =>
        assert(s == s.distinct.sorted)
      }
    }
  }

  test("all-NULL group folds to an empty array; int input widens to long") {
    import spark.implicits._
    val df = Seq((1L, null.asInstanceOf[java.lang.Long]))
      .toDF("g", "v")
    val out = df.groupBy(col("g")).agg(SortedLongSet.of(col("v")).as("s"))
      .collect()
    assert(out.head.getSeq[Long](1).isEmpty)
    val ints = Seq((1L, 3), (1L, 1), (1L, 3), (2L, 7)).toDF("g", "v")
    val got = ints.groupBy(col("g")).agg(SortedLongSet.of(col("v")).as("s"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(got == Map(1L -> Seq(1L, 3L), 2L -> Seq(7L)))
  }
}
