package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

// TEMPORARY scratch: same-JVM A/B of pathCounts variants on the sf0.1
// copurchase input — `anti` (the frontier-delta production shape),
// `oldfold` (the pre-r15 full-fold loop, caller-side distinct, exactly
// as shipped at r14 HEAD). Interleaved reps so host noise hits both.
object DebugPC {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val par = spark.sparkContext.defaultParallelism

    def pairs(): DataFrame = {
      val li = spark.read.parquet("/root/testdata/sf0.1/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      graft.operators.Graph.itemPairs(li, "l_orderkey", "l_partkey")
        .select(col("u"), col("v"))
    }

    def edgesRawDistinct(): DataFrame =
      pairs().repartition(par, col("u")).distinct()

    // the r14-HEAD production loop, verbatim (full re-agg per round)
    def oldFold(): Long = {
      val e = edgesRawDistinct().select(explode(array(
          struct(col("u").as("__s"), col("v").as("__t")),
          struct(col("v").as("__s"), col("u").as("__t")))).as("__e"))
        .select(col("__e.__s").as("__s"), col("__e.__t").as("__t"))
        .repartition(par, col("__s")).localCheckpoint()
      val sess = e.sparkSession
      val aqeWas = sess.conf.get("spark.sql.adaptive.enabled", "true")
      val cached = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
      try {
        sess.conf.set("spark.sql.adaptive.enabled", "false")
        val srcs = e.select(col("__s")).distinct()
          .orderBy(col("__s")).limit(4)
        var labels = srcs.select(col("__s").as("__src"), col("__s").as("__n"),
          lit(0).as("__lvl"), lit(1L).as("__sig"))
        var i = 1
        while (i <= 4) {
          val frontier = labels.filter(col("__lvl") === i - 1)
            .select(col("__src"), col("__n").as("__s"), col("__sig"))
          val cand = e.join(frontier, Seq("__s"))
            .select(col("__src"), col("__t").as("__n"), lit(i).as("__lvl"),
              col("__sig"))
          labels = labels.unionByName(cand)
            .groupBy(col("__src"), col("__n"))
            .agg(min(col("__lvl")).as("__ml"),
              sum(when(col("__lvl") < i, col("__sig")).otherwise(lit(0L)))
                .as("__so"),
              sum(when(col("__lvl") === i, col("__sig")).otherwise(lit(0L)))
                .as("__sn"))
            .select(col("__src"), col("__n"), col("__ml").as("__lvl"),
              when(col("__ml") < i, col("__so")).otherwise(col("__sn"))
                .as("__sig"))
            .persist()
          cached += labels
          i += 1
        }
        labels.count()
      } finally {
        sess.conf.set("spark.sql.adaptive.enabled", aqeWas)
        cached.foreach(_.unpersist(blocking = false))
        graft.operators.Dedup.freeCheckpoints(e)
      }
    }

    def anti(): Long =
      graft.operators.Graph.pathCounts(pairs(), "u", "v", 4, 4,
        dedupEdges = true).count()

    def antiPre(): Long =
      graft.operators.Graph.pathCounts(edgesRawDistinct(), "u", "v", 4, 4)
        .count()

    def time(label: String)(body: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = body
      println(f"[$label] ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
      spark.catalog.clearCache()
      System.gc()
    }

    // one warmup of each, then interleaved measured reps
    time("warm-anti")(anti())
    time("warm-old")(oldFold())
    time("warm-antipre")(antiPre())
    (1 to 3).foreach { r =>
      time(s"anti#$r")(anti())
      time(s"old#$r")(oldFold())
      time(s"antipre#$r")(antiPre())
    }
    spark.stop()
  }
}
