package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** The composed corpus-preparation pipeline: behavior on a hand fixture and
  * the one-shuffle plan claim. */
class PipelineSpec extends AnyFunSuite with SparkSpec {

  test("cleanCorpus scrubs PII, gates quality, dedups normalized text") {
    import spark.implicits._
    val good = "the quick brown fox jumps over the lazy dog again and again today"
    val docs = Seq(
      (1L, good),
      (2L, good + "!!"),  // normalizes to doc 1's text → duplicate, dropped
      (3L, "tiny"),       // survives cleaning too short → gated
      (4L, "mail me at bob@example.com " + good),
    ).toDF("doc_id", "text")
    val out = Pipeline.cleanCorpus(docs, "doc_id", "text", minChars = 20, minAlpha = 0.5)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toList
    val byId = out.map(r => r._1 -> r._2).toMap
    assert(byId.keySet == Set(1L, 4L))
    assert(byId(4L).startsWith("mail me at email ")) // masked, then normalized
    assert(!byId(4L).contains("bob"))
    assert(out.find(_._1 == 1L).get._3 == 13) // token count of the cleaned text
  }

  test("the whole pipeline plans exactly ONE exchange (the dedup window)") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001", "documents")
    val plan = Pipeline.cleanCorpus(docs, "doc_id", "text")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected one shuffle, plan:\n$plan")
  }
}
