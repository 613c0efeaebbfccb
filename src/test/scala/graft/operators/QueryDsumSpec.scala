package graft.operators

import graft.SparkSpec

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the dsum/davg fixed-point fast path's safety contract: values whose
  * scaled magnitude leaves the double-exact integer range must RAISE, not
  * silently mis-round — the bound the old decimal cast enforced by being
  * exact (ADVICE r15: the 2^53 per-value bound was documented but never
  * enforced at runtime). */
class QueryDsumSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("dsum is exact round-half-away-from-zero on the BINARY double " +
      "(signum·floor(|x|·10^s + 0.5)) at scale 2") {
    val xs = Seq(1.005, 2.675, -1.005, 0.004, -0.004)
    val got = xs.toDF("x")
      .agg(Query.dsum(col("x")).as("s")).collect()(0).getDouble(0)
    // expectation replays the documented FP sequence exactly — including
    // its binary-representation verdicts (1.005·100 rounds DOWN to
    // 100.4999…; 2.675·100 rounds UP to 267.5 at the multiply)
    val want = xs.map(x =>
      math.signum(x).toLong * math.floor(math.abs(x) * 100 + 0.5).toLong)
      .sum.toDouble / 100
    assert(got == want && want == 2.68)
  }

  test("dsum ignores NULLs and sums negatives exactly") {
    val got = Seq(Some(-3.10), None, Some(0.55)).toDF("x")
      .agg(Query.dsum(col("x")).as("s")).collect()(0).getDouble(0)
    assert(got == -2.55)
  }

  test("dsum RAISES when |x|*10^s reaches 2^53 instead of silently " +
      "losing integer resolution") {
    val bad = Seq(9.1e13, 1.0).toDF("x") // 9.1e13 * 100 = 9.1e15 > 2^53
    val e = intercept[Exception] {
      bad.agg(Query.dsum(col("x")).as("s")).collect()
    }
    assert(e.getMessage.contains("2^53"), e.getMessage)
    // just below the bound stays exact and silent
    val ok = Seq(9.0e13).toDF("x") // 9.0e15 < 2^53 ≈ 9.007e15
      .agg(Query.dsum(col("x")).as("s")).collect()(0).getDouble(0)
    assert(ok == 9.0e13)
  }

  test("dsum rejects scales where 10^s is not exactly representable") {
    intercept[IllegalArgumentException] { Query.dsum(col("x"), 16) }
    intercept[IllegalArgumentException] { Query.dsum(col("x"), -1) }
  }
}
