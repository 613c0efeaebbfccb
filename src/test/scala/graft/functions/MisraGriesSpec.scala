package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The Misra-Gries guarantees under arbitrary partitionings: lower-bound
  * estimates, n/(k+1) max under-estimate, and no-heavy-hitter-missed. */
class MisraGriesSpec extends AnyFunSuite with SparkSpec {

  // known frequencies: a=400, b=250, c=90, plus 260 distinct singletons
  private def fixture = {
    val sq = spark
    import sq.implicits._
    val tokens =
      Seq.fill(400)("a") ++ Seq.fill(250)("b") ++ Seq.fill(90)("c") ++
        (0 until 260).map(i => s"noise$i")
    tokens.toDF("token")
  }

  test("MG sketch: lower bounds, n/(k+1) error, heavy hitters never missed — any partitioning") {
    val truth = Map("a" -> 400L, "b" -> 250L, "c" -> 90L)
    val n = 400 + 250 + 90 + 260
    val k = 8
    val slack = n / (k + 1) // 111
    for (parts <- Seq(1, 4, 32)) {
      val est = fixture.repartition(parts)
        .agg(MisraGries.sketch(col("token"), k).as("h"))
        .select(explode(col("h")).as("h"))
        .select(col("h.token"), col("h.lower_bound"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(est.size <= k)
      est.foreach { case (t, lb) =>
        val truef = truth.getOrElse(t, 1L)
        assert(lb <= truef, s"[$parts parts] $t: estimate $lb must LOWER-bound $truef")
        assert(truef - lb <= slack,
          s"[$parts parts] $t: under-estimate ${truef - lb} must be <= n/(k+1)=$slack")
      }
      // every token with true frequency > n/(k+1) is guaranteed present
      truth.filter(_._2 > slack).keys.foreach { t =>
        assert(est.contains(t), s"[$parts parts] heavy hitter $t missing: $est")
      }
    }
  }

  test("exact and approximate operators agree on the dominant tokens") {
    val sq = spark
    import sq.implicits._
    val docs = Seq(
      (1L, "spark spark spark duck duck goose"),
      (2L, "spark spark duck lake river"),
      (3L, "spark mountain duck")
    ).toDF("doc_id", "text")
    val exact = graft.operators.TextAnalysis.heavyHitters(docs, "text", 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(exact == Seq(("spark", 6L), ("duck", 4L)))
    // the sketch with ample capacity is exact
    val approx = graft.operators.TextAnalysis.heavyHittersApprox(docs, "text", 16)
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(approx("spark") == 6L && approx("duck") == 4L)
  }
}
