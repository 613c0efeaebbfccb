package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Snapshot-diff classification and chunk-checksum corruption localization. */
class ReconcileSpec extends AnyFunSuite with SparkSpec {

  test("snapshotDiff classifies insert/delete/update/same with null-safe compare") {
    import spark.implicits._
    val oldDf = Seq(
      (1L, Option("a")), (2L, Option("b")),
      (3L, Option.empty[String]), (4L, Option("d"))
    ).toDF("pk", "v")
    val newDf = Seq(
      (1L, Option("a")),          // same
      (2L, Option("B")),          // update
      (3L, Option.empty[String]), // same: null <=> null must NOT read as change
      (5L, Option("e"))           // insert; pk 4 deleted
    ).toDF("pk", "v")
    val out = Reconcile.snapshotDiff(oldDf, newDf, Seq("pk"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "same", 2L -> "update", 3L -> "same",
      4L -> "delete", 5L -> "insert"))
  }

  test("null-to-value and value-to-null transitions classify as update") {
    import spark.implicits._
    val oldDf = Seq((1L, Option.empty[String]), (2L, Option("x"))).toDF("pk", "v")
    val newDf = Seq((1L, Option("x")), (2L, Option.empty[String])).toDF("pk", "v")
    val out = Reconcile.snapshotDiff(oldDf, newDf, Seq("pk"), Seq("v"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "update", 2L -> "update"))
  }

  test("chunkChecksums + verifyChunks localize a corrupted row to its one chunk") {
    import spark.implicits._
    val src = (0L until 64L).map(i => (i, s"row$i")).toDF("pk", "v")
    val corrupt = (0L until 64L).map(i => (i, if (i == 37L) "XXX" else s"row$i"))
      .toDF("pk", "v")
    val repr = concat_ws("|", col("pk"), col("v"))
    val a = Reconcile.chunkChecksums(src, "pk", 0L, 63L, 8, repr)
    val b = Reconcile.chunkChecksums(corrupt, "pk", 0L, 63L, 8, repr)
    val bad = Reconcile.verifyChunks(a, b).select("chunk_id").as[Int].collect().toSeq
    assert(bad == Seq(4)) // span 8 -> pk 37 lives in chunk 4; only it differs
    // identical content (re-computed) verifies clean
    val a2 = Reconcile.chunkChecksums(src, "pk", 0L, 63L, 8, repr)
    assert(Reconcile.verifyChunks(a, a2).isEmpty)
  }

  test("fast (xxhash64) and md5 checksum paths localize corruption to the same chunk") {
    import spark.implicits._
    val src = (0L until 64L).map(i => (i, s"row$i")).toDF("pk", "v")
    val corrupt = (0L until 64L).map(i => (i, if (i == 21L) "XXX" else s"row$i"))
      .toDF("pk", "v")
    val repr = concat_ws("|", col("pk"), col("v"))
    def badChunks(f: (org.apache.spark.sql.DataFrame, String, Long, Long, Int,
        org.apache.spark.sql.Column) => org.apache.spark.sql.DataFrame): Seq[Int] =
      Reconcile.verifyChunks(f(src, "pk", 0L, 63L, 8, repr),
          f(corrupt, "pk", 0L, 63L, 8, repr))
        .select("chunk_id").as[Int].collect().toSeq.sorted
    assert(badChunks(Reconcile.chunkChecksums) == Seq(2)) // pk 21, span 8
    assert(badChunks(Reconcile.chunkChecksumsFast) == Seq(2))
    // clean re-computation verifies clean on the fast path too
    val a = Reconcile.chunkChecksumsFast(src, "pk", 0L, 63L, 8, repr)
    val b = Reconcile.chunkChecksumsFast(src, "pk", 0L, 63L, 8, repr)
    assert(Reconcile.verifyChunks(a, b).isEmpty)
  }

  test("chunkChecksums sum does not overflow past ~2^15 rows per chunk") {
    // 200k rows of ~2^47-mean 48-bit hashes in ONE chunk sums to ~2^64.6 —
    // past Long.MaxValue. The decimal(38,0) accumulator must return the
    // exact BigInt sum where a BIGINT sum would wrap silently negative.
    import spark.implicits._
    val n = 200000L
    val df = spark.range(n).select(col("id").as("pk"))
    val repr = concat_ws("|", col("pk"))
    val out = Reconcile.chunkChecksums(df, "pk", 0L, n - 1, 1, repr).head()
    assert(out.getLong(out.fieldIndex("n")) == n)
    val sumH = BigInt(out.getDecimal(out.fieldIndex("sum_h")).toBigInteger)
    // recompute the per-row hashes independently and sum exactly
    val expected = df
      .select(conv(substring(md5(repr), 1, 12), 16, 10).cast("long").as("h"))
      .as[Long].collect().foldLeft(BigInt(0))(_ + _)
    assert(sumH == expected, s"decimal sum must be exact: $sumH vs $expected")
    assert(expected > BigInt(Long.MaxValue),
      "fixture must actually exceed the BIGINT range for this test to prove anything")
  }

  test("chunkChecksums are row-order insensitive within a chunk") {
    import spark.implicits._
    val fwd = (0L until 16L).map(i => (i, s"r$i")).toDF("pk", "v")
    val rev = (0L until 16L).reverse.map(i => (i, s"r$i")).toDF("pk", "v")
    val repr = concat_ws("|", col("pk"), col("v"))
    val a = Reconcile.chunkChecksums(fwd, "pk", 0L, 15L, 4, repr)
    val b = Reconcile.chunkChecksums(rev, "pk", 0L, 15L, 4, repr)
    assert(Reconcile.verifyChunks(a, b).isEmpty)
  }

  test("mergeAggStates over any split equals the full recompute exactly") {
    import spark.implicits._
    val rows = (1L to 300L).map(i => (s"g${i % 7}", i.toDouble / 4))
    val df = rows.toDF("g", "v")
    val v = col("v").cast("decimal(18,2)")
    def fetch(d: org.apache.spark.sql.DataFrame) = d
      .select(col("g"), col("sum_v").cast("double"), col("n_v"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
      .sortBy(_._1).toSeq
    val full = fetch(Reconcile.aggState(df, Seq("g"), v))
    // three-way split, including an empty slice
    val parts = Seq(
      df.filter(col("v") < 20), df.filter(col("v") >= 20),
      df.where(lit(false)))
    val merged = fetch(Reconcile.mergeAggStates(
      parts.map(Reconcile.aggState(_, Seq("g"), v)): _*))
    assert(merged == full && full.map(_._3).sum == 300L)
  }

  test("merkleTree: complete level structure, and a single-chunk corruption " +
      "flips exactly one digest path to the root (log-compare localization)") {
    import spark.implicits._
    def chunks(corrupt: Option[Int]) = (0 until 8).map { i =>
      val sum = if (corrupt.contains(i)) 999999L else 1000L + i
      (i, 10L + i, BigDecimal(sum), 77L ^ i)
    }.toDF("chunk_id", "n", "sum_h", "xor_h")
      .withColumn("sum_h", col("sum_h").cast("decimal(38,0)"))
    def tree(c: org.apache.spark.sql.DataFrame) =
      Reconcile.merkleTree(c, levels = 3).collect()
        .map(r => (r.getInt(0), r.getLong(1)) -> r.getString(2)).toMap
    val clean = tree(chunks(None))
    // 8 + 4 + 2 + 1 nodes, one root
    assert(clean.size == 15)
    assert((0 to 3).forall(l => clean.keys.count(_._1 == l) == (8 >> l)))
    // determinism: same input, same digests
    assert(tree(chunks(None)) == clean)
    // corrupt chunk 5: exactly ONE node differs per level, on the halving
    // path 5 -> 2 -> 1 -> 0 — top-down compare descends one branch
    val bad = tree(chunks(Some(5)))
    val diff = clean.keySet.filter(k => clean(k) != bad(k))
    assert(diff == Set((0, 5L), (1, 2L), (2, 1L), (3, 0L)))
    // merkleDiff returns exactly the descent path, digests on both sides
    val got = Reconcile.merkleDiff(
        Reconcile.merkleTree(chunks(None), levels = 3),
        Reconcile.merkleTree(chunks(Some(5)), levels = 3))
      .collect().map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(got == Set((0, 5L), (1, 2L), (2, 1L), (3, 0L)))
    // a truncated replica (missing root) surfaces as a NULL-digest row
    val trunc = Reconcile.merkleTree(chunks(None), levels = 3)
      .filter(col("level") < 3)
    val missing = Reconcile.merkleDiff(
        Reconcile.merkleTree(chunks(None), levels = 3), trunc)
      .collect()
    assert(missing.length == 1 && missing.head.getInt(0) == 3 &&
      missing.head.isNullAt(3))
  }
}
