package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage decomposition of the basket pair pipeline (assoc rules /
  * market basket family) — which leg burns the CPU: the collect_set fold,
  * the SortedPairs explode, or the support aggregation. */
object BasketDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = LocalTuning(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val li = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"))
    li.write.format("noop").mode("overwrite").save() // warm page cache
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG $label wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    (1 to 3).foreach { i =>
      timed(s"sets-only       #$i") {
        li.repartition(32, col("l_orderkey")).groupBy(col("l_orderkey"))
          .agg(array_sort(collect_set(col("l_partkey"))).as("__items"))
          .select(count(lit(1))).collect()
      }
      timed(s"sets+explode    #$i") {
        li.repartition(32, col("l_orderkey")).groupBy(col("l_orderkey"))
          .agg(array_sort(collect_set(col("l_partkey"))).as("__items"))
          .select(explode(org.apache.spark.sql.graft.SortedPairs.of(
            col("__items"))).as("__e"))
          .select(count(lit(1))).collect()
      }
      timed(s"pairs+support   #$i") {
        operators.Graph.itemPairs(li, "l_orderkey", "l_partkey")
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
          .select(count(lit(1))).collect()
      }
      timed(s"nativeset-only  #$i") {
        li.repartition(32, col("l_orderkey")).groupBy(col("l_orderkey"))
          .agg(org.apache.spark.sql.graft.SortedLongSet.of(
            col("l_partkey")).as("__items"))
          .select(count(lit(1))).collect()
      }
      timed(s"nativeset+expl  #$i") {
        li.repartition(32, col("l_orderkey")).groupBy(col("l_orderkey"))
          .agg(org.apache.spark.sql.graft.SortedLongSet.of(
            col("l_partkey")).as("__items"))
          .select(explode(org.apache.spark.sql.graft.SortedPairs.of(
            col("__items"))).as("__e"))
          .select(count(lit(1))).collect()
      }
      timed(s"selfjoin+supp   #$i") {
        val d = li.repartition(32, col("l_orderkey")).distinct()
        val a = d.select(col("l_orderkey"), col("l_partkey").as("u"))
        val b = d.select(col("l_orderkey"), col("l_partkey").as("v"))
        a.join(b, Seq("l_orderkey")).filter(col("u") < col("v"))
          .groupBy(col("u"), col("v")).agg(count(lit(1)).as("support"))
          .select(count(lit(1))).collect()
      }
      timed(s"item countDist  #$i") {
        li.groupBy(col("l_partkey"))
          .agg(countDistinct(col("l_orderkey")).as("__s"))
          .select(count(lit(1))).collect()
      }
    }
    val agg = li.repartition(32, col("l_orderkey")).groupBy(col("l_orderkey"))
      .agg(array_sort(collect_set(col("l_partkey"))).as("__items"))
    println(agg.queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("Aggregate") || l.contains("Exchange"))
      .mkString("\n"))
    spark.stop()
  }
}
