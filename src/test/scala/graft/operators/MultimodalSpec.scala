package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** X5: multimodal schema/plumbing — binary payloads, metadata pruning,
  * partition-batched (stubbed) decode. */
class MultimodalSpec extends AnyFunSuite with SparkSpec {

  private lazy val media = {
    import spark.implicits._
    Multimodal.fromDocuments(
      Seq((1L, "tiny"), (2L, "a much longer document body here"), (3L, "mid size doc"))
        .toDF("doc_id", "text"))
  }

  test("schema contract: opaque binary payload + typed metadata struct") {
    assert(media.schema("payload").dataType.typeName == "binary")
    val meta = media.schema("meta").dataType
    assert(meta.isInstanceOf[org.apache.spark.sql.types.StructType])
    assert(Multimodal.schema.fieldNames.toSeq == Seq("media_id", "payload", "meta"))
  }

  test("metadata filters never touch payload bytes (column pruning)") {
    val pruned = Multimodal.filterByMeta(media, "image", 10).select("media_id")
    val plan = pruned.queryExecution.optimizedPlan.toString
    assert(!plan.contains("payload"), s"payload must be pruned out:\n$plan")
  }

  test("stubDecode is deterministic and shape-stable") {
    val f1 = Multimodal.stubDecode("hello world".getBytes, 8)
    val f2 = Multimodal.stubDecode("hello world".getBytes, 8)
    assert(f1.toSeq == f2.toSeq && f1.length == 8)
    assert(Multimodal.stubDecode(Array.emptyByteArray, 8).toSeq == Seq.fill(8)(0.0f))
  }

  test("extractFeatures: distributed, schema'd, one feature row per media row") {
    val feats = Multimodal.extractFeatures(media, dims = 4)
    assert(feats.schema.fieldNames.toSeq == Seq("media_id", "n_bytes", "feature"))
    val rows = feats.orderBy("media_id").collect()
    assert(rows.length == 3)
    assert(rows(0).getInt(1) == 4) // "tiny" = 4 bytes
    assert(rows.forall(_.getSeq[Float](2).length == 4))
  }

  test("sampleFrames emits strided fixed-size windows of the payload") {
    val frames = Multimodal.sampleFrames(media.filter(col("media_id") === 2L),
      frameBytes = 8, stride = 2)
    val got = frames.orderBy("frame_no").collect()
    assert(got.length >= 2)
    assert(got.head.getInt(1) == 0)
    // frame 0 = first 8 payload bytes
    assert(new String(got.head.getAs[Array[Byte]](2)) == "a much l")
  }

  test("resizePayload pads/truncates to the target size") {
    val out = Multimodal.resizePayload(media, 16)
      .select(length(col("payload"))).collect().map(_.getInt(0))
    assert(out.forall(_ == 16))
  }
}
