package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/**
 * Delimited/JSON file edges. The reference speaks only SQL databases; a
 * Spark-native engine's equivalent of "another system's export" is CSV and
 * JSON-lines interchange. Both directions are Spark's distributed readers/
 * writers — one file per partition, schema applied explicitly on read (an
 * inferred schema costs an extra full scan and can mis-type columns, so the
 * engine treats inference as a debugging convenience, never the data path).
 */
object Files {

  /** Distributed CSV write: RFC-4180 quoting (quotes doubled via
    * escape='"'), explicit header. Embedded delimiters, quotes and
    * newlines in field values survive round-trip with [[readCsv]]. */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("escape", "\"")
      .csv(path)

  /** Schema-first CSV read. `multiLine` honors quoted embedded newlines —
    * the flag costs splittability per file (a multi-line record can span a
    * split boundary), which is why the writer keeps many files: parallelism
    * comes from the file count instead. `emptyValue`/`nullValue` defaults
    * distinguish empty string from NULL exactly as the writer emits them. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("escape", "\"")
      .option("multiLine", "true")
      .csv(path)

  /** Distributed JSON-lines write (one object per line — the splittable
    * form; a single top-level array would serialize the whole read). */
  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Schema-first JSON-lines read. Doubles survive bit-exactly: the writer
    * emits shortest-round-trip decimal forms and the parser restores the
    * identical IEEE value. */
  def readJson(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)

  /** Columnar interchange the text formats can't give: ORC keeps types,
    * nulls and binary exactly (it is the other lakehouse-native columnar
    * format besides parquet), with min/max stride statistics the reader
    * uses for predicate pushdown just like parquet footers. Splittable,
    * compressed, zero text-serialization seams. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  /** ORC read. The schema rides in the file metadata; passing the expected
    * schema pins column order and surfaces drift as an analysis error
    * instead of silent reordering. */
  def readOrc(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).orc(path)
}
