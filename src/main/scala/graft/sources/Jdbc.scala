package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import graft.Tables.TableMeta

/**
 * JDBC edge (SURVEY §7 step 9) — the production boundary where taps
 * actually lived: relational DB in, relational DB out.
 *
 * taps' two access paths become Spark's native partitioned JDBC read:
 *  - keyset pagination (S4) generalizes to `partitionColumn/lowerBound/
 *    upperBound/numPartitions` — N disjoint pk ranges scanned in parallel,
 *    the O(n) property of the watermark scan times N-way parallelism;
 *  - offset pagination (S3, the no-pk fallback) has no parallel analogue —
 *    a single-partition read, exactly as slow as taps documents
 *    (`README.rdoc:36`); we surface it honestly as `numPartitions=1`.
 *
 * The write side carries taps' bulk-import semantics (S5): multi-row
 * batches (`batchsize` ≙ chunksize, tunable by the ChunkSizer controller),
 * DDL replay (S6/S7) via `createTableColumnTypes`/`createTableOptions`,
 * and index/sequence pass-through (S8/S9) as post-write statements.
 *
 * No live database ships in this container, so the wrappers are thin and
 * the OPTION-BUILDING logic — what to partition on, how many partitions,
 * what DDL to emit — is pure and unit-tested.
 */
object Jdbc {

  /** Partitioning plan for a JDBC read, derived from pk metadata the same
    * way `DataStream.factory` chooses an access path
    * (`lib/taps/data_stream.rb:228-242`). */
  final case class ReadPlan(options: Map[String, String], parallel: Boolean)

  /** Build read options: keyset tables range-partition on the pk; no-pk /
    * composite-pk tables fall back to a single partition (taps' offset
    * path — document the pathology, don't hide it). `bounds` come from a
    * cheap `SELECT min(pk), max(pk)` (taps' verify_stream does the same
    * max(pk) probe, `lib/taps/data_stream.rb:329-336`). */
  def readPlan(url: String, meta: TableMeta, bounds: Option[(Long, Long)],
               numPartitions: Int, fetchSize: Int = 1000): ReadPlan = {
    val base = Map(
      "url" -> url,
      "dbtable" -> meta.name,
      "fetchsize" -> fetchSize.toString)
    (meta.primaryKey, bounds) match {
      case (Seq(pk), Some((lo, hi))) if meta.singleIntPk =>
        ReadPlan(base ++ Map(
          "partitionColumn" -> pk,
          "lowerBound" -> lo.toString,
          "upperBound" -> hi.toString,
          "numPartitions" -> numPartitions.toString), parallel = true)
      case _ =>
        ReadPlan(base + ("numPartitions" -> "1"), parallel = false)
    }
  }

  def read(spark: SparkSession, plan: ReadPlan): DataFrame =
    spark.read.format("jdbc").options(plan.options).load()

  /** Bulk-import options (S5): `batchsize` is taps' chunksize — start at
    * the reference default (1000) and let a ChunkSizer retune it. */
  def writeOptions(url: String, table: String, batchSize: Int = 1000,
                   isolation: String = "READ_COMMITTED"): Map[String, String] =
    Map(
      "url" -> url,
      "dbtable" -> table,
      "batchsize" -> batchSize.toString,
      "isolationLevel" -> isolation)

  def write(df: DataFrame, opts: Map[String, String], mode: SaveMode = SaveMode.Append): Unit =
    df.write.format("jdbc").options(opts).mode(mode).save()

  /** taps' hot loop, generalized: drive a sequence of batched writes with
    * the AIMD [[graft.streaming.ChunkSizer]] — each batch's observed wall
    * time retunes the next batch size toward the ~1 s/batch operating point
    * (`lib/taps/operation.rb:480-548`). `write` receives (batch, batchSize);
    * a thrown exception is taps' broken pipe: the controller resets 10→1 and
    * the batch retries, aborting after the controller is exhausted.
    * Returns (rows written, final controller state). Pure orchestration —
    * inject `write` (a JDBC executor in production, a probe in tests) and
    * `clock` (nanoTime in production, synthetic in tests). */
  def adaptiveWriteLoop[T](rows: Iterator[T],
                           write: (Seq[T], Int) => Unit,
                           sizer0: graft.streaming.ChunkSizer = graft.streaming.ChunkSizer(),
                           clock: () => Long = System.nanoTime): (Long, graft.streaming.ChunkSizer) = {
    var sizer = sizer0
    var written = 0L
    var pending: Vector[T] = Vector.empty // failed batch awaiting retry
    def nextBatch(): Vector[T] =
      if (pending.nonEmpty) {
        // re-chunk the failed rows at the reduced size (taps re-sends the
        // stream from the watermark with the reset chunksize)
        val (b, rest) = pending.splitAt(sizer.chunksize)
        pending = rest
        b
      } else {
        val b = Vector.newBuilder[T]
        var i = 0
        while (i < sizer.chunksize && rows.hasNext) { b += rows.next(); i += 1 }
        b.result()
      }
    var batch = nextBatch()
    while (batch.nonEmpty && !sizer.exhausted) {
      val t0 = clock()
      try {
        write(batch, sizer.chunksize)
        written += batch.size
        sizer = sizer.observe((clock() - t0) / 1e9)
      } catch {
        case _: Exception =>
          sizer = sizer.onFailure   // 10 → 1 → exhausted, like taps
          pending = batch ++ pending // the same rows retry, re-chunked smaller
      }
      batch = nextBatch()
    }
    (written, sizer)
  }

  /** S6/S7 schema replay: CREATE TABLE DDL from the DataFrame schema —
    * `Schema.dump_table`'s Spark face (`lib/taps/schema.rb:15-30`). */
  def createTableDdl(df: DataFrame, table: String, primaryKey: Seq[String]): String = {
    val cols = df.schema.toDDL
    val pk = if (primaryKey.nonEmpty) s", PRIMARY KEY (${primaryKey.mkString(", ")})" else ""
    s"CREATE TABLE $table ($cols$pk)"
  }

  /** S8 index pass-through: executed against the target AFTER the data load
    * (taps' deferred-index optimization, `lib/taps/operation.rb:249-254`;
    * `--indexes-first` flips the order). */
  def createIndexDdl(table: String, indexName: String, columns: Seq[String],
                     unique: Boolean = false): String = {
    val u = if (unique) "UNIQUE " else ""
    s"CREATE ${u}INDEX $indexName ON $table (${columns.mkString(", ")})"
  }

  /** S9 sequence reset (PostgreSQL form): re-sync the pk sequence after a
    * bulk load (`lib/taps/schema.rb:74-80`). */
  def resetSequenceSql(table: String, pk: String): String =
    s"SELECT setval(pg_get_serial_sequence('$table', '$pk'), " +
      s"coalesce((SELECT max($pk) FROM $table), 0) + 1, false)"
}
