package graft.operators

import java.nio.file.Files

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, Tables}

/** S2/A1: footer-metadata row counts — correct, and ONE Spark job total
  * regardless of table count (the metastore-scale property). */
class CatalogOpsSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("countPerTable matches full-scan counts, from footers only") {
    val tables = Seq("nation", "region", "customer", "events")
    val got = CatalogOps.countPerTable(spark, dir, tables)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    tables.foreach { t =>
      assert(got(t) == Tables.load(spark, dir, t).count(), s"table $t")
    }
  }

  test("countPerTable schedules exactly one job for N tables") {
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(jobStart: SparkListenerJobStart): Unit = jobs += 1
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      CatalogOps.countPerTable(spark, dir, Tables.names).collect()
      // listener delivery is async — poll briefly for the JobStart event
      val deadline = System.currentTimeMillis() + 5000
      while (jobs < 1 && System.currentTimeMillis() < deadline) Thread.sleep(50)
      assert(jobs == 1, s"expected one job for ${Tables.names.size} tables, saw $jobs")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("countPerTable sums part files when the table is a directory") {
    val tmp = Files.createTempDirectory("catalog_parts").toString
    val df = Tables.load(spark, dir, "customer")
    df.repartition(3).write.parquet(s"$tmp/customer.parquet")
    val got = CatalogOps.countPerTable(spark, tmp, Seq("customer")).head()
    assert(got.getLong(1) == df.count())
  }

  test("profileColumns counts nulls, distincts and min/max per column") {
    import spark.implicits._
    val df = Seq(
      (Some(3L), Some("b")), (Some(1L), None),
      (Some(3L), Some("a")), (None, Some("a"))
    ).toDF("k", "v")
    val out = CatalogOps.profileColumns(df, Seq("k", "v"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4), r.getString(5))).sortBy(_._1).toSeq
    assert(out == Seq(
      ("k", 4L, 1L, 2L, "1", "3"),
      ("v", 4L, 1L, 2L, "a", "b")))
  }
}
