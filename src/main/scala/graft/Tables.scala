package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Test-data catalog: the Spark-native analogue of taps' catalog
 * introspection (table enumeration + per-table schema/primary-key metadata;
 * cf. reference `lib/taps/server.rb:147-158`, `lib/taps/utils.rb:136-144`).
 *
 * taps discovers tables and primary keys at runtime from the source RDBMS
 * via Sequel. Our engine is file-native: a "database" is a directory of
 * Parquet tables, and primary-key metadata is carried alongside (Parquet has
 * no pk concept). For a JDBC edge the same [[TableMeta]] shape is populated
 * from `DatabaseMetaData` instead — the operators downstream are agnostic.
 *
 * Scale note: loading is lazy (`spark.read.parquet` only builds a plan), so
 * the catalog itself costs nothing; at 100 TB the per-table DataFrames are
 * partitioned by the Parquet layout and every downstream filter/projection
 * is pushed into the scan by Catalyst.
 */
object Tables {

  /** Primary-key metadata, the driver of access-path selection
    * (keyset vs offset pagination — reference `lib/taps/data_stream.rb:228-242`). */
  final case class TableMeta(name: String, primaryKey: Seq[String]) {
    /** taps' `single_integer_primary_key` predicate (`lib/taps/utils.rb:140-144`):
      * keyset pagination is only sound for a single integral pk. */
    def singleIntPk: Boolean = primaryKey.size == 1
  }

  /** All tables of the shared fixture "database" (TESTDATA.md). */
  val meta: Seq[TableMeta] = Seq(
    TableMeta("region", Seq("r_regionkey")),
    TableMeta("nation", Seq("n_nationkey")),
    TableMeta("customer", Seq("c_custkey")),
    TableMeta("supplier", Seq("s_suppkey")),
    TableMeta("part", Seq("p_partkey")),
    TableMeta("orders", Seq("o_orderkey")),
    TableMeta("lineitem", Seq("l_orderkey", "l_linenumber")), // composite → offset path
    TableMeta("events", Seq("event_id")),
    TableMeta("documents", Seq("doc_id")),
    TableMeta("embeddings", Seq("vec_id")),
  )

  val names: Seq[String] = meta.map(_.name)

  def metaOf(name: String): TableMeta =
    meta.find(_.name == name).getOrElse(TableMeta(name, Nil))

  /** Lazy per-table load; Catalyst pushes filters/pruning into this scan.
    *
    * Parallelism note: a Parquet scan is never more parallel than its
    * row-group count, and a single-row-group file (every fixture table at
    * test scale) pins downstream map stages to one core. The remedy is
    * deliberately NOT here: a blanket repartition-on-load taxes every
    * query whose first operator is itself a shuffle (windows, folds,
    * sorts — measured net-negative). Operators with heavy MAP-side
    * compute apply [[graft.operators.Query.ensureParallelism]] at their
    * own entry instead, where the fan-out provably pays for the exchange;
    * footer-metadata aggregates use [[loadRaw]] semantics (this scan,
    * aggregate pushdown intact).
    *
    * `events.ts` is written as Parquet TIMESTAMP(NANOS), which Spark's
    * reader rejects outright (PARQUET_TYPE_ILLEGAL). We read it through the
    * legacy nanos-as-long path and rebuild a microsecond timestamp with
    * integer arithmetic (`div`, not `/` — a double division would lose
    * precision above 2^53 ns). DuckDB truncates ns→µs the same way. */
  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    loadRaw(spark, dir, name)

  /** The bare scan — alias kept for call sites that must NEVER gain an
    * exchange above the scan (footer min/max/count aggregate pushdown
    * reads statistics, not rows). */
  def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** The whole database as a name→DataFrame registry (taps' `db.tables`). */
  def catalog(spark: SparkSession, dir: String): Map[String, DataFrame] =
    names.map(n => n -> load(spark, dir, n)).toMap

  /** Table-name list as a single-column DataFrame — the relational form of
    * the catalog, so that table filtering (P6–P8) is itself a query. */
  def namesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    names.toDF("table_name")
  }
}
