package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The invariant taps enforces operationally via its verify/repair path (T3):
  * the chunk partition of a table is exactly the table — no loss, no dup. */
class ScanSpec extends AnyFunSuite with SparkSpec {

  private def ids(n: Int) = {
    import spark.implicits._
    // non-contiguous pks with gaps, like real post-delete tables
    (1 to n).map(i => (i.toLong * 3 + (i % 7), s"row$i")).toDF("pk", "payload")
  }

  test("keyset chunk loop reassembles the table exactly (no loss, no dup)") {
    val df = ids(500).cache()
    var watermark = Long.MinValue
    var seen = Vector.empty[Long]
    var done = false
    while (!done) {
      val chunk = Scan.keysetChunk(df, "pk", watermark, 64)
        .select("pk").collect().map(_.getLong(0))
      if (chunk.isEmpty) done = true // taps' completion sentinel: empty batch
      else { seen ++= chunk; watermark = chunk.max }
    }
    val expected = df.select("pk").collect().map(_.getLong(0)).sorted.toVector
    assert(seen == expected)
  }

  test("offsetChunk and row_number variant agree") {
    val df = ids(300)
    val a = Scan.offsetChunk(df, Seq("pk"), 50, 120).select("pk", "payload").collect().toSeq
    val b = Scan.offsetChunkViaRowNumber(df, Seq("pk"), 50, 120)
      .orderBy("pk").select("pk", "payload").collect().toSeq
    assert(a == b)
    assert(a.size == 50)
  }

  test("offsetChunk past the end is empty (completion sentinel)") {
    assert(Scan.offsetChunk(ids(10), Seq("pk"), 5, 100).count() == 0)
  }

  test("rangeChunks is a disjoint cover: every row gets exactly one chunk_id in [0, parts)") {
    val df = ids(1000)
    val lo = df.agg(min("pk")).head().getLong(0)
    val hi = df.agg(max("pk")).head().getLong(0)
    val chunked = Scan.rangeChunks(df, "pk", lo, hi, 8).cache()
    assert(chunked.count() == 1000) // no loss, no dup (withColumn preserves rows)
    val range = chunked.agg(min("chunk_id"), max("chunk_id")).head()
    assert(range.getInt(0) >= 0 && range.getInt(1) < 8)
    // chunks respect pk order: max(pk) of chunk i < min(pk) of chunk i+1
    val bounds = chunked.groupBy("chunk_id")
      .agg(min("pk").as("lo"), max("pk").as("hi"))
      .orderBy("chunk_id").collect()
    bounds.sliding(2).foreach {
      case Array(a, b) => assert(a.getLong(2) < b.getLong(1))
      case _ =>
    }
  }

  test("rangeBounds assigns every pk to the same chunk as rangeChunks") {
    import org.apache.spark.sql.functions.col
    for ((lo, hi, parts) <- Seq((0L, 1000L, 8), (7L, 1003L, 7), (5L, 6L, 4))) {
      val bounds = Scan.rangeBounds(lo, hi, parts)
      assert(bounds.size == parts)
      val df = ids((hi - lo).toInt).select((col("pk") + lo).as("pk"))
      val byChunkId = Scan.rangeChunks(df, "pk", lo, hi, parts)
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val byBounds = df.collect().map(_.getLong(0)).map { pk =>
        pk -> bounds.indexWhere { case (l, h) => pk >= l && pk < h }
      }.toMap
      assert(byBounds == byChunkId, s"lo=$lo hi=$hi parts=$parts")
    }
  }

  test("access path selection mirrors DataStream.factory") {
    assert(Scan.chooseAccessPath(graft.Tables.metaOf("orders")) == "keyset")
    assert(Scan.chooseAccessPath(graft.Tables.metaOf("lineitem")) == "offset")
  }

  test("over-fetch limits (calc_limit, data_stream.rb:268-277)") {
    assert(Scan.calcLimit(1000, serverSide = true) == 1100)
    assert(Scan.calcLimit(1000, serverSide = false) == 3000)
  }

  test("keyset predicate is pushed into the parquet scan") {
    val li = graft.Tables.load(spark, "/root/testdata/sf0.001", "orders")
    val plan = Scan.keysetChunk(li, "o_orderkey", 5000L, 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(o_orderkey), GreaterThan(o_orderkey,5000)]"),
      s"watermark filter must reach the scan:\n$plan")
  }
}
