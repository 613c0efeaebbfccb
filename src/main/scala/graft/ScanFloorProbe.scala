package graft
import org.apache.spark.sql.functions._
/** One-off probe for the r15-verdict scan-floor question: does a
  * multi-row-group copy of the single-row-group fixture move the
  * sub-second agg keys' wall time? (Committed while the experiment runs;
  * results recorded in DEPLOY.md.) */
object ScanFloorProbe {
  def main(args: Array[String]): Unit = {
    val spark = LocalTuning(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC").getOrCreate()
    val dir = "/root/testdata/sf0.1"
    val li = Tables.load(spark, dir, "lineitem")
    // 8-row-group copy: small block size forces row-group rotation
    val split = "/tmp/li_split"
    li.repartition(1).write.mode("overwrite")
      .option("parquet.block.size", (8L * 1024 * 1024).toString)
      .parquet(split)
    def q(df: org.apache.spark.sql.DataFrame) = df
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(operators.Query.dsum(col("l_quantity")).as("sum_qty"),
        operators.Query.dsum(col("l_extendedprice"), 4).as("sum_base"),
        count(lit(1)).as("n"))
    def time(tag: String, body: => Unit): Unit = (1 to 4).foreach { i =>
      val t0 = System.nanoTime(); body
      println(f"$tag pass$i ${(System.nanoTime()-t0)/1e9}%.3f s")
    }
    time("ORIG ", q(Tables.load(spark, dir, "lineitem")).collect())
    time("SPLIT", q(spark.read.parquet(split)).collect())
    println("orig  partitions=" + Tables.load(spark, dir, "lineitem").rdd.getNumPartitions)
    println("split partitions=" + spark.read.parquet(split).rdd.getNumPartitions)
    spark.stop()
  }
}
