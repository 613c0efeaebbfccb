package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** CDC semantics: last-change-wins, delete removal, insert of unseen keys,
  * untouched pass-through, and SCD2 effectivity chaining. */
class CdcSpec extends AnyFunSuite with SparkSpec {
  import org.apache.spark.sql.DataFrame

  private def snap: DataFrame = {
    import spark.implicits._
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
  }

  // key 1: updated twice (last wins); key 2: updated then deleted;
  // key 4: inserted; key 3: untouched
  private def changes: DataFrame = {
    import spark.implicits._
    Seq(
      (1L, "a1", 1, "U"), (1L, "a2", 2, "U"),
      (2L, "b1", 1, "U"), (2L, "b1", 2, "D"),
      (4L, "d", 1, "I")
    ).toDF("id", "v", "seq", "op")
  }

  test("applyChanges: last change wins, D removes, I inserts, rest pass") {
    val out = Cdc.applyChanges(snap, changes, Seq("id"), "seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(out == Seq((1L, "a2"), (3L, "c"), (4L, "d")))
  }

  test("applyChanges with an empty log is the identity") {
    val out = Cdc.applyChanges(snap, changes.where(lit(false)), Seq("id"), "seq")
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
    assert(out == Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("scd2History: [valid_from, valid_to) chains, is_current on live tail") {
    val out = Cdc.scd2History(changes, Seq("id"), "seq")
      .select(col("id"), col("seq"), col("valid_from"), col("valid_to"),
        col("is_current"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2),
        if (r.isNullAt(3)) -1 else r.getInt(3), r.getInt(4)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(out == Seq(
      (1L, 1, 1, 2, 0), (1L, 2, 2, -1, 1),   // v2 current
      (2L, 1, 1, 2, 0), (2L, 2, 2, -1, 0),   // deleted: tail NOT current
      (4L, 1, 1, -1, 1)))                    // insert current
  }
}
