package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/**
 * Row validation & coercion — the reference's "data hygiene" layer.
 *
 * taps validates every outgoing chunk against the source schema and aborts
 * the transfer on the first bad value (`Taps::InvalidData`):
 *  - varchar(n) length enforcement (`lib/taps/utils.rb:47-52,56-68`),
 *  - 32-bit integer range (SQLite→PG overflow, `lib/taps/data_stream.rb:206-213`),
 *  - MySQL text-reported-as-blob coercion (`lib/taps/utils.rb:78-95`).
 *
 * Spark-native we offer BOTH modes per validator:
 *  - '''raise mode''' (parity): a `raise_error` guard column — the whole job
 *    fails on the first violating row, like taps;
 *  - '''quarantine mode''' (the 100 TB mode): violations are selected into a
 *    separate DataFrame instead of killing a multi-hour job. Both are pure
 *    `Column` expressions, stay inside whole-stage codegen, and push the
 *    violation predicate down to the scan.
 */
object Validate {

  /** P1: header projection. taps turns row-hashes into a `{header, data}`
    * columnar batch using the first row's key order (`lib/taps/utils.rb:54-72`).
    * In Spark the header IS the schema; this pins an explicit, stable
    * column order for the wire/sink. */
  def headerProject(df: DataFrame, header: Seq[String]): DataFrame =
    df.select(header.map(col): _*)

  /** The varchar(n) extraction taps does with a regex on the db_type string
    * (`lib/taps/utils.rb:48`): "varchar(255)" → 255. Exposed as an expression
    * over a type-name column (F5 shape). */
  def varcharLen(dbType: Column): Column = {
    val m = regexp_extract(dbType, "varchar\\((\\d+)\\)", 1)
    // non-matching types extract "" — NULL, not an ANSI cast error
    when(m =!= "", m.cast("int"))
  }

  /** P3 quarantine mode: rows whose string column exceeds the declared
    * varchar length. The predicate is codegen'd and pushed down. */
  def varcharViolations(df: DataFrame, c: String, maxLen: Int): DataFrame =
    df.filter(length(col(c)) > maxLen)

  /** P3 raise mode (taps parity): fail the job if any value exceeds `maxLen`,
    * with an InvalidData-style message (`lib/taps/utils.rb:60-66`). */
  def requireVarcharLen(df: DataFrame, c: String, maxLen: Int): DataFrame = {
    val guard = when(length(col(c)) > maxLen,
      raise_error(concat(
        lit(s"InvalidData: value exceeds varchar($maxLen) in column $c: "),
        substring(col(c), 1, 32)))
    ).otherwise(col(c))
    df.withColumn(c, guard)
  }

  /** P4 quarantine mode: values outside a declared integral range (taps'
    * "integer out of range", `lib/taps/data_stream.rb:206-213`; defaults to
    * signed 32-bit, the SQLite→PostgreSQL failure it guards). */
  def intRangeViolations(df: DataFrame, c: String,
                         lo: Long = Int.MinValue, hi: Long = Int.MaxValue): DataFrame =
    df.filter(col(c) < lo || col(c) > hi)

  /** P4 raise mode. */
  def requireIntRange(df: DataFrame, c: String,
                      lo: Long = Int.MinValue, hi: Long = Int.MaxValue): DataFrame = {
    val guard = when(col(c) < lo || col(c) > hi,
      raise_error(concat(lit(s"InvalidData: integer out of range in $c: "),
        col(c).cast("string")))
    ).otherwise(col(c))
    df.withColumn(c, guard)
  }

  /** P2: blob→string coercion for sources that misreport text as binary
    * (MySQL — `incorrect_blobs`/`blobs_to_string`, `lib/taps/utils.rb:78-95`).
    * Driven by source metadata: callers pass the columns the source declared
    * `text` but delivered as bytes. */
  def textCast(df: DataFrame, cols: Seq[String]): DataFrame =
    cols.foldLeft(df)((d, c) => d.withColumn(c, col(c).cast(StringType)))

  /** The columns needing coercion, given (column → declared db_type) source
    * metadata and the source URL scheme — mirrors `incorrect_blobs`'
    * mysql-only guard (`lib/taps/utils.rb:78-87`). */
  def incorrectBlobs(dbUrl: String, dbTypes: Map[String, String]): Seq[String] =
    if (!dbUrl.startsWith("mysql")) Nil
    else dbTypes.collect { case (c, t) if t == "text" => c }.toSeq

  /** Timestamp hygiene: taps NULLs invalid MySQL datetimes
    * (`lib/taps/data_stream.rb:229-231`). Spark-native: try_to_timestamp
    * yields NULL instead of failing — same semantics. */
  def nullInvalidTimestamps(df: DataFrame, c: String, fmt: String): DataFrame =
    df.withColumn(c, try_to_timestamp(col(c), lit(fmt)))
}
