package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** CDC semantics: last-change-wins, delete removal, insert of unseen keys,
  * untouched pass-through, and SCD2 effectivity chaining. */
class CdcSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def snap: DataFrame = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
  }

  // key 1: updated twice (last wins); key 2: updated then deleted;
  // key 4: inserted; key 3: untouched
  private def changes: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a1", 1, "U"), (1L, "a2", 2, "U"),
      (2L, "b1", 1, "U"), (2L, "b1", 2, "D"),
      (4L, "d", 1, "I")
    ).toDF("id", "v", "seq", "op")
  }

  test("applyChanges: last change wins, D removes, I inserts, rest pass") {
    val out = Cdc.applyChanges(snap, changes, Seq("id"), "seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(out == Seq((1L, "a2"), (3L, "c"), (4L, "d")))
  }

  test("applyChanges with an empty log is the identity") {
    val out = Cdc.applyChanges(snap, changes.where(lit(false)), Seq("id"), "seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("applyChangesPruned: only touched partitions rewritten, untouched files byte-identical") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory("graft_cdc_pruned").toString
    // 64 keys with inclusive pk domain [0, 63] over 8 chunks of span 8
    val snap0 = (0L until 64L).map(k => (k, s"v$k")).toDF("id", "v")
    Scan.rangeChunks(snap0, "id", 0L, 63L, 8)
      .write.mode("overwrite").partitionBy("chunk_id").parquet(dir)
    // changes touch ONLY chunks 1 (ids 8..15) and 3 (ids 24..31):
    // update key 9, update key 12, delete key 25
    val changes = Seq(
      (9L, "v9'", 1, "U"), (25L, "x", 1, "D"), (12L, "v12'", 1, "U")
    ).toDF("id", "v", "seq", "op")
    def fileState(chunks: Seq[Int]): Map[String, (Long, Int)] =
      chunks.flatMap { c =>
        val p = Paths.get(dir, s"chunk_id=$c")
        Files.list(p).iterator().asScala.filter(_.toString.endsWith(".parquet")).map { f =>
          f.toString -> (Files.size(f), java.util.Arrays.hashCode(Files.readAllBytes(f)))
        }
      }.toMap
    val untouchedBefore = fileState(Seq(0, 2, 4, 5, 6, 7))
    val touched = Cdc.applyChangesPruned(dir, changes, "id", "seq", 0L, 63L, 8)
    assert(touched == Seq(1, 3), s"change keys 9,12,25 live in chunks 1 and 3: $touched")
    // untouched partition files: same paths, same bytes
    assert(fileState(Seq(0, 2, 4, 5, 6, 7)) == untouchedBefore,
      "untouched partitions must pass through byte-identical")
    // the landed layout equals the query-form fold of the same log
    val expect = Cdc.applyChanges(snap0, changes, Seq("id"), "seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    val got = spark.read.parquet(dir).select(col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(got == expect && got.size == 63) // 64 - 1 delete
  }

  test("applyChangesPruned: a fully-deleted chunk's partition directory is removed") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_cdc_prune_del").toString
    val snap0 = (0L until 16L).map(k => (k, s"v$k")).toDF("id", "v")
    Scan.rangeChunks(snap0, "id", 0L, 15L, 4)
      .write.mode("overwrite").partitionBy("chunk_id").parquet(dir)
    // delete every key of chunk 2 (ids 8..11)
    val changes = (8L to 11L).map(k => (k, "x", 1, "D")).toDF("id", "v", "seq", "op")
    val touched = Cdc.applyChangesPruned(dir, changes, "id", "seq", 0L, 15L, 4)
    assert(touched == Seq(2))
    assert(!Files.exists(Paths.get(dir, "chunk_id=2")),
      "an emptied chunk must not leave stale files behind")
    assert(spark.read.parquet(dir).count() == 12)
  }

  test("applyChangesPruned: out-of-range insert keys clamp into the end chunks") {
    import spark.implicits._
    import java.nio.file.{Files, Paths}
    val dir = Files.createTempDirectory("graft_cdc_prune_clamp").toString
    // layout over the OBSERVED domain [8, 23]: 4 chunks of span 4
    val snap0 = (8L until 24L).map(k => (k, s"v$k")).toDF("id", "v")
    Scan.rangeChunks(snap0, "id", 8L, 23L, 4)
      .write.mode("overwrite").partitionBy("chunk_id").parquet(dir)
    // backfill key 1 (far below lower: 8 - span*2) and growth key 99
    val changes = Seq((1L, "low", 1, "I"), (99L, "high", 1, "I"))
      .toDF("id", "v", "seq", "op")
    val touched = Cdc.applyChangesPruned(dir, changes, "id", "seq", 8L, 23L, 4)
    assert(touched == Seq(0, 3), "below-lower clamps to chunk 0, above-upper to the last")
    assert(!Files.exists(Paths.get(dir, "chunk_id=-1")) &&
      !Files.exists(Paths.get(dir, "chunk_id=-2")),
      "no negative-chunk partition directory may ever be written")
    val got = spark.read.parquet(dir).select(col("id"), col("v"))
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "low" && got(99L) == "high" && got.size == 18)
  }

  test("scd2History: [valid_from, valid_to) chains, is_current on live tail") {
    val out = Cdc.scd2History(changes, Seq("id"), "seq")
      .select(col("id"), col("seq"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getInt(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (1L, 1, 1, 2, 0), (1L, 2, 2, -1, 1),   // v2 current
      (2L, 1, 1, 2, 0), (2L, 2, 2, -1, 0),   // deleted: tail NOT current
      (4L, 1, 1, -1, 1)))                    // insert current
  }
}
