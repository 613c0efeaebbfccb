package graft

import org.apache.spark.sql.SparkSession
import graft.operators.Dedup

/** Throwaway diagnostic: candidate counts with/without the PPJoin
  * positional filter, plus wall times for the two jaccard bench keys. */
object JaccardDiag {
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"DIAG   stage $label wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    for ((num, den) <- Seq((4, 5), (7, 10))) {
      println(s"DIAG theta=$num/$den")
      val reps = Dedup.jaccardReps(docs, "doc_id", "text").localCheckpoint()
      timed("reps")(println(s"DIAG   reps=${reps.count()}"))
      val sorted = timed("sorted-ckpt")(
        Dedup.jaccardOrderedPrefix(reps, num, den).localCheckpoint())
      val before = timed("cand-sizeonly")(
        Dedup.jaccardCandidates(sorted, num, den, positional = false).count())
      val after = timed("cand-positional")(
        Dedup.jaccardCandidates(sorted, num, den, positional = true).count())
      println(s"DIAG theta=$num/$den candidates size-only=$before positional=$after " +
        f"cut=${100.0 * (before - after) / math.max(before, 1L)}%.1f%%")
    }
    for (key <- Seq("ext_dedup_jaccard_join", "ext_jaccard_threshold_sweep");
         rep <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(key)(spark, dir).count()
      println(f"DIAG $key rep=$rep rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
