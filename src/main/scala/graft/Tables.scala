package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

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
    * reads statistics, not rows).
    *
    * The events fixture's `ts` physical type has changed across fixture
    * generations (TIMESTAMP(NANOS) → TIMESTAMP_MICROS NTZ), so the load is
    * schema-ADAPTIVE — branch on what the reader actually produced:
    *  - LongType       → legacy nanos-as-long read; rebuild µs with integer
    *                     `div` (a double division would lose precision above
    *                     2^53 ns; DuckDB truncates ns→µs the same way).
    *  - TimestampNTZ   → cast to session-TZ timestamp. The session TZ is
    *                     pinned UTC everywhere (Bench/Verify/specs), so the
    *                     cast is value-exact and matches DuckDB's reading of
    *                     naive micros.
    *  - TimestampType  → pass through.
    * Anything else fails loudly with the observed type (fixture drift is a
    * one-minute failure here, not a lost round of artifacts). */
  def loadRaw(spark: SparkSession, dir: String, name: String): DataFrame = {
    if (name == "events") {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      normalizeEventsTs(spark.read.parquet(s"$dir/$name.parquet"))
    } else spark.read.parquet(s"$dir/$name.parquet")
  }

  /** Normalize an events frame's `ts` to session-TZ TimestampType, whatever
    * physical form the reader produced (shared by the batch load and the
    * streaming specs, which read the raw file through `readStream`). */
  def normalizeEventsTs(raw: DataFrame): DataFrame =
    raw.schema("ts").dataType match {
      case LongType         => raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => raw.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType    => raw
      case other =>
        throw new IllegalStateException(
          s"events.ts: unexpected Parquet-read type $other (want LONG/TIMESTAMP_NTZ/TIMESTAMP)")
    }

  /** Expected POST-[[load]] logical schema of every fixture table.
    *
    * The fixture has changed under the repo twice (events `ts`:
    * TIMESTAMP(NANOS) in early rounds, TIMESTAMP_MICROS NTZ now) and each
    * time the first symptom was a lost round of driver artifacts. This map
    * pins what downstream operators actually rely on, so [[schemaDrift]]
    * turns the next regeneration into a one-minute named failure.
    * `events.ts` is pinned to TimestampType because [[loadRaw]] normalizes
    * all accepted physical forms to it (watermarks, range-join binWidth
    * arithmetic and the temporal family need a session-TZ timestamp). */
  val expectedSchema: Map[String, Seq[(String, DataType)]] = Map(
    "region" -> Seq("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> Seq("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> Seq("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> Seq("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> Seq("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType, "p_size" -> IntegerType,
      "p_retailprice" -> DoubleType),
    "orders" -> Seq("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> Seq("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    "events" -> Seq("event_id" -> LongType, "ts" -> TimestampType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> Seq("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> Seq("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType),
  )

  /** Fixture-schema drift guard: load every table and diff its logical
    * schema against [[expectedSchema]]. Returns one human-readable line per
    * mismatch (`table.column: got X, want Y`) — empty means healthy.
    * Callers choose severity: Bench folds the lines into `warmup_errors`
    * (artifact must survive), Verify prints them to stderr, the spec fails. */
  def schemaDrift(spark: SparkSession, dir: String): Seq[String] =
    meta.flatMap { m =>
      try {
        val got = load(spark, dir, m.name).schema
          .map(f => f.name -> (f.dataType match {
            // containsNull / nullable flags are writer artifacts, not
            // semantics — compare element types only
            case ArrayType(e, _) => ArrayType(e)
            case t => t
          }))
        val want = expectedSchema(m.name)
        if (got == want) Nil
        else {
          val gm = got.toMap
          want.collect { case (c, w) if !gm.get(c).contains(w) =>
            s"${m.name}.$c: got ${gm.get(c).map(_.simpleString).getOrElse("ABSENT")}, want ${w.simpleString}"
          } ++ got.collect { case (c, g) if !want.exists(_._1 == c) =>
            s"${m.name}.$c: got ${g.simpleString}, want ABSENT"
          } ++ (if (got.map(_._1) != want.map(_._1) &&
                    got.map(_._1).toSet == want.map(_._1).toSet)
                  Seq(s"${m.name}: column ORDER ${got.map(_._1).mkString(",")}, want ${want.map(_._1).mkString(",")}")
                else Nil)
        }
      } catch { case e: Throwable =>
        Seq(s"${m.name}: load failed (${e.getClass.getSimpleName}: ${Option(e.getMessage).getOrElse("").take(120)})")
      }
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
