package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Multimodal columns (SURVEY §2.11 X5): image/audio/video as opaque
 * `binary` payloads with typed metadata, plus the Spark-side plumbing for
 * per-batch decode / feature-extract / resize / frame-sample.
 *
 * Design for 100 TB of media:
 *  - payloads stay **opaque binary** end-to-end; only metadata (struct of
 *    width/height/codec/duration) is queryable — filters on metadata prune
 *    row groups WITHOUT touching payload bytes (Parquet column pruning);
 *  - decode runs **per-partition, batch-at-a-time** (`mapPartitions` over an
 *    iterator — the Scala analogue of `mapInPandas`: same batch shape, same
 *    "library runs once per partition, not once per row" economics);
 *  - the decode itself is STUBBED deterministically ([[stubDecode]]) — real
 *    codecs (JPEG/ffmpeg) aren't in this container; the contract
 *    (schema in/out, batching, partitioning) is real and tested, and a real
 *    decoder drops in by replacing one pure function.
 */
object Multimodal {

  /** The typed metadata carried beside every binary payload. */
  val metaSchema: StructType = StructType(Seq(
    StructField("modality", StringType, nullable = false),  // image | audio | video
    StructField("format", StringType, nullable = false),    // png | wav | mp4 | …
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true),
  ))

  /** Canonical multimodal table schema: id + opaque payload + metadata. */
  val schema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("meta", metaSchema, nullable = false),
  ))

  /** Deterministic fixture builder: derives a small multimodal table from
    * the `documents` fixture (payload = utf8 bytes of the text; metadata
    * derived from doc stats). Lets every test/query run without media
    * libraries while exercising the real schema and partitioning. */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      encode(col("text"), "UTF-8").as("payload"),
      struct(
        lit("image").as("modality"),
        lit("stub").as("format"),
        (length(col("text")) % 640).cast("int").as("width"),
        (length(col("text")) % 480).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms"),
      ).as("meta"))

  /** Metadata-only predicate — the 100 TB win: Parquet reads the `meta`
    * column only; payload bytes are never deserialized for filtered-out
    * rows. */
  def filterByMeta(df: DataFrame, modality: String, minWidth: Int): DataFrame =
    df.filter(col("meta.modality") === modality && col("meta.width") >= minWidth)

  /** Feature row produced by the (stubbed) decoder. */
  val featureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false),
  ))

  /** STUB decode/feature-extract: a real implementation decodes the payload
    * with an image/audio library and emits an embedding; this deterministic
    * fake folds payload bytes into a fixed-width feature vector. The
    * *plumbing* — partition-batched iteration, schema contract, no
    * driver-side collect — is the production shape. */
  def stubDecode(payload: Array[Byte], dims: Int = 8): Array[Float] = {
    val acc = new Array[Float](dims)
    var i = 0
    while (i < payload.length) { acc(i % dims) += (payload(i) & 0xff) / 255.0f; i += 1 }
    acc
  }

  /** Batched feature extraction over partitions (mapInPandas-shaped). */
  def extractFeatures(df: DataFrame, dims: Int = 8): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col("media_id"), col("payload")).rdd.mapPartitions { rows =>
      // per-partition setup happens HERE (decoder init, model load) — once
      // per task, not once per row
      rows.map { r =>
        val payload = r.getAs[Array[Byte]]("payload")
        Row(r.getLong(0), payload.length, stubDecode(payload, dims).toSeq)
      }
    }
    spark.createDataFrame(rdd, featureSchema)
  }

  /** Frame sampling plumbing for video-like payloads: emit every `stride`-th
    * fixed-size window of the payload as a "frame" (a real impl samples
    * decoded frames; the partitioning/explode shape is identical). */
  def sampleFrames(df: DataFrame, frameBytes: Int, stride: Int): DataFrame =
    df.select(col("media_id"),
      posexplode(transform(
        sequence(lit(0), greatest(ceil(length(col("payload")) / lit(frameBytes * stride)).cast("int") - 1, lit(0))),
        i => substring(col("payload"), (i * frameBytes * stride + 1).cast("int"), lit(frameBytes)))))
      .withColumnRenamed("pos", "frame_no")
      .withColumnRenamed("col", "frame")

  /** Resize stub: truncate/pad the payload to `n` bytes — stands in for an
    * image resize; preserves the binary-in/binary-out contract. */
  def resizePayload(df: DataFrame, n: Int): DataFrame =
    df.withColumn("payload",
      rpad(col("payload"), n, Array[Byte](0)))
}
