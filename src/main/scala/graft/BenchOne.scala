package graft
import org.apache.spark.sql.SparkSession
object BenchOne {
  def main(args: Array[String]): Unit = {
    val q = args(0); val sfDir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Tables.names.foreach(t => Tables.load(spark, sfDir, t).write.format("noop").mode("overwrite").save())
    val t0 = System.nanoTime()
    SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"[bench-one] $q ${(System.nanoTime()-t0)/1e9}%.2f s")
    val t1 = System.nanoTime()
    SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
    println(f"[bench-one] $q warm ${(System.nanoTime()-t1)/1e9}%.2f s")
    spark.stop()
  }
}
