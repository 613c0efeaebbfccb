package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Change-data-capture application (SURVEY §2.9 [EXT]): fold an
 * insert/update/delete log into a snapshot, and build slowly-changing
 * history from the same log. The taps lineage is direct: taps replays a
 * source database into a destination; the incremental version of that is
 * exactly "apply the change log since the last watermark" — these
 * operators are that step as declarative Spark plans.
 *
 * Both are pure DataFrame programs: one window pass over the CHANGES (the
 * small side) and one anti-join against the snapshot — the 100 TB snapshot
 * is never shuffled beyond the pk join, and never rewritten where
 * untouched.
 */
object Cdc {

  /** Latest change per key: one row per pk, the change with the highest
    * `seqCol` (change-log ordinal, LSN, commit timestamp). Ties broken by
    * op precedence D > U > I only deterministically via seq — callers must
    * provide a total per-key order, as every CDC consumer requires. */
  private def latestPerKey(changes: DataFrame, pkCols: Seq[String],
                           seqCol: String): DataFrame = {
    val w = Window.partitionBy(pkCols.map(col): _*).orderBy(col(seqCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Apply a change log to a snapshot. `changes` carries the snapshot's
    * data columns plus `opCol` ('I'/'U'/'D') and `seqCol`; the LAST change
    * per key wins: D removes the row, I/U replace-or-insert it. Rows of
    * `snapshot` with no change pass through untouched.
    *
    * Scale shape: the window runs over the change log (incremental ≪
    * snapshot); the snapshot sees ONE left-anti hash join on the pk —
    * broadcastable whenever the day's keyset fits, a plain shuffle join
    * otherwise. No full-table window, no driver round-trips. */
  def applyChanges(snapshot: DataFrame, changes: DataFrame,
                   pkCols: Seq[String], seqCol: String,
                   opCol: String = "op"): DataFrame = {
    val latest = latestPerKey(changes, pkCols, seqCol)
    val dataCols = snapshot.columns.toSeq
    val upserts = latest.filter(col(opCol) =!= "D")
      .select(dataCols.map(col): _*)
    val untouched = snapshot.join(
      latest.select(pkCols.map(col): _*), pkCols, "left_anti")
    untouched.unionByName(upserts)
  }

  /** SCD-type-2 history from a change log: every change becomes a
    * versioned row with [valid_from, valid_to) effectivity — valid_to is
    * the NEXT change's seq (null while current) — plus is_current
    * (1 only for the live, non-deleted tail version of each key).
    * One keyed window pass, shuffle = |changes| rows on the pk. */
  def scd2History(changes: DataFrame, pkCols: Seq[String], seqCol: String,
                  opCol: String = "op"): DataFrame = {
    val w = Window.partitionBy(pkCols.map(col): _*).orderBy(col(seqCol))
    changes
      .withColumn("valid_from", col(seqCol))
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .withColumn("is_current",
        when(col("valid_to").isNull && col(opCol) =!= "D", 1).otherwise(0))
  }
}
