package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** P1–P4 semantics, both quarantine and raise (taps-parity) modes. */
class ValidateSpec extends AnyFunSuite with SparkSpec {

  private lazy val df = {
    import spark.implicits._
    Seq((1L, "ok"), (2L, "this string is definitely too long"), (3L, "fine"))
      .toDF("id", "s")
  }

  test("headerProject pins explicit column order (P1)") {
    assert(Validate.headerProject(df, Seq("s", "id")).columns.toSeq == Seq("s", "id"))
  }

  test("varchar violations quarantine (P3)") {
    assert(Validate.varcharViolations(df, "s", 8).select("id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("varchar raise mode fails the job like taps InvalidData (P3)") {
    val e = intercept[Exception] {
      Validate.requireVarcharLen(df, "s", 8).collect()
    }
    assert(e.getMessage.contains("InvalidData"))
  }

  test("int range quarantine + raise (P4)") {
    import spark.implicits._
    val ints = Seq(1L, Int.MaxValue.toLong + 5, -42L).toDF("v")
    assert(Validate.intRangeViolations(ints, "v").count() == 1)
    intercept[Exception] {
      Validate.requireIntRange(ints, "v").collect()
    }
    assert(Validate.requireIntRange(Seq(7L).toDF("v"), "v").collect().length == 1)
  }

  test("varcharLen extracts n from db_type string (utils.rb:48)") {
    import spark.implicits._
    val types = Seq("varchar(255)", "text", "varchar(8)").toDF("t")
    assert(types.select(Validate.varcharLen(col("t"))).collect()
      .map(r => if (r.isNullAt(0)) -1 else r.getInt(0)).toSeq == Seq(255, -1, 8))
  }

  test("textCast coerces declared-text binary columns (P2)") {
    import spark.implicits._
    val b = Seq(("a".getBytes, 1)).toDF("c", "i")
    val out = Validate.textCast(b, Seq("c"))
    assert(out.schema("c").dataType.typeName == "string")
    assert(out.head().getString(0) == "a")
  }

  test("incorrectBlobs applies only to mysql sources (utils.rb:78-87)") {
    val types = Map("a" -> "text", "b" -> "blob", "c" -> "text")
    assert(Validate.incorrectBlobs("mysql://h/db", types).toSet == Set("a", "c"))
    assert(Validate.incorrectBlobs("postgres://h/db", types).isEmpty)
  }

  test("invalid timestamps become NULL, not errors (data_stream.rb:229-231)") {
    import spark.implicits._
    val ts = Seq("2026-01-15 10:30:00", "0000-00-00 00:00:00").toDF("t")
    val out = Validate.nullInvalidTimestamps(ts, "t", "yyyy-MM-dd HH:mm:ss").collect()
    assert(!out(0).isNullAt(0) && out(1).isNullAt(0))
  }
}
