package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Catalog-level table selection (SURVEY §2.2 P6–P8) and counts (S2/A1/A3).
 *
 * taps plans a transfer by listing tables, then subtracting: a `--filter`
 * regex (`lib/taps/operation.rb:48-63`), an `--exclude_tables` list
 * (:44-46), and the already-completed set on resume (:113-115,325-332).
 * We express all three relationally — the exclusions as left-anti joins —
 * so the same logic works whether the "catalog" is 10 fixture tables or a
 * 100k-table lakehouse metastore.
 */
object CatalogOps {

  /** P6: keep tables matching a regex (Ruby `names.grep(re)` semantics =
    * substring match, like `rlike`). `--tables a,b` sugar compiles to
    * `(^a$|^b$)` (`lib/taps/cli.rb:137-141`). */
  def filterRegex(names: DataFrame, re: String): DataFrame =
    names.filter(col("table_name").rlike(re))

  /** The `--tables` sugar: exact-name list → alternation regex. */
  def tablesToRegex(tables: Seq[String]): String =
    tables.map(t => s"^$t$$").mkString("(", "|", ")")

  /** P7: drop excluded tables — left-anti join against the exclusion list. */
  def excludeTables(spark: SparkSession, names: DataFrame, exclude: Seq[String]): DataFrame = {
    import spark.implicits._
    names.join(exclude.toDF("table_name"), Seq("table_name"), "left_anti")
  }

  /** P8: on resume, drop tables already fully transferred (anti-join against
    * the manifest's completed set — taps' `completed_tables`). */
  def skipCompleted(names: DataFrame, completed: DataFrame): DataFrame =
    names.join(completed, Seq("table_name"), "left_anti")

  /** S2/A1: per-table row counts as one DataFrame. Counts run as CONCURRENT
    * Spark jobs (driver-side `.par` — the scheduler interleaves them across
    * executor slots), each a count-star-optimized Parquet scan (row-group
    * metadata only), so this stays O(metadata) and fully parallel at a
    * 100k-table metastore. taps counts tables strictly sequentially
    * (`lib/taps/operation.rb:342-368`) — this is the first free win. */
  def countPerTable(spark: SparkSession, dir: String, tables: Seq[String]): DataFrame = {
    import spark.implicits._
    import scala.collection.parallel.CollectionConverters._
    tables.par.map { t =>
      (t, graft.Tables.load(spark, dir, t).count())
    }.toList.sortBy(_._1).toDF("table_name", "cnt")
  }

  /** A3: grand total (`inject(0){|a,c| a+=c}`, `lib/taps/operation.rb:334-336`). */
  def recordCountTotal(counts: DataFrame): DataFrame =
    counts.agg(sum(col("cnt")).as("total_records"))

  /** S6: schema dump as rows (name, type DDL) — the relational face of
    * `Schema.dump_table` (`lib/taps/schema.rb:15-30`). Replay side uses
    * `StructType.toDDL` via [[schemaDdl]]. */
  def schemaDump(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.schema.fields.map(f => (f.name, f.dataType.sql, f.nullable))
      .toSeq.toDF("col_name", "data_type", "nullable")
  }

  /** S7: the executable DDL string (`CREATE TABLE` body) for schema replay. */
  def schemaDdl(df: DataFrame): String = df.schema.toDDL
}
