package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Deterministic sampling/split semantics. */
class SamplingSpec extends AnyFunSuite with SparkSpec {

  private lazy val docs = {
    import spark.implicits._
    (1L to 400L).map(i => (i, s"grp${i % 4}")).toDF("id", "grp")
  }

  test("hashSplit is deterministic, covers every row, and lands near the target") {
    val s1 = Sampling.hashSplit(docs, "id", 90)
    val s2 = Sampling.hashSplit(docs, "id", 90)
    assert(s1.collect().toSeq.sortBy(_.getLong(0)) ==
      s2.collect().toSeq.sortBy(_.getLong(0)))
    val n = s1.count()
    val train = s1.filter(col("split") === "train").count()
    assert(n == 400)
    assert(train > 320 && train < 400) // 90% ± hash noise on 400 rows
  }

  test("hashSplit assignment is stable under corpus growth (no leakage flips)") {
    val small = Sampling.hashSplit(docs.filter(col("id") <= 100), "id", 90)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    val big = Sampling.hashSplit(docs, "id", 90)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    small.foreach { case (id, split) => assert(big(id) == split) }
  }

  test("stratified keeps exactly ceil(frac*n) rows per stratum, deterministically") {
    val out = Sampling.stratified(docs, "grp", "id", 0.2)
    val perGroup = out.groupBy("grp").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // 100 rows per group -> exactly 20 kept
    assert(perGroup.values.toSet == Set(20L) && perGroup.size == 4)
    assert(out.collect().toSeq.sortBy(_.getLong(0)) ==
      Sampling.stratified(docs, "grp", "id", 0.2).collect().toSeq.sortBy(_.getLong(0)))
  }

  test("stratified frac=1 keeps everything; frac=0 keeps nothing") {
    assert(Sampling.stratified(docs, "grp", "id", 1.0).count() == 400)
    assert(Sampling.stratified(docs, "grp", "id", 0.0).count() == 0)
  }

  test("capPerGroup keeps at most n rows per group, lowest order first") {
    val out = Sampling.capPerGroup(docs, "grp", "id", 5)
    val byGroup = out.collect().map(r => (r.getString(1), r.getLong(0)))
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    assert(byGroup.values.forall(_.size == 5))
    // grp0 holds ids 4,8,12,... -> lowest five
    assert(byGroup("grp0") == Seq(4L, 8L, 12L, 16L, 20L))
  }

  test("packSequences: offsets accumulate per group; window = start div capacity") {
    import spark.implicits._
    val chunks = Seq(
      ("s1", 1L, 0, 64), ("s1", 1L, 1, 64), ("s1", 2L, 0, 64),
      ("s1", 2L, 1, 10), ("s1", 3L, 0, 64), ("s2", 9L, 0, 5),
    ).toDF("source", "doc_id", "chunk_no", "n_tokens")
    val out = Sampling.packSequences(chunks, "source", Seq("doc_id", "chunk_no"),
        "n_tokens", 128)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2),
        r.getLong(4), r.getLong(5))).sortBy(x => (x._1, x._4))
    // s1 stream offsets: 0,64,128,192,202 -> windows 0,0,1,1,1; s2 restarts at 0
    assert(out.toSeq == Seq(
      ("s1", 1L, 0, 0L, 0L), ("s1", 1L, 1, 64L, 0L), ("s1", 2L, 0, 128L, 1L),
      ("s1", 2L, 1, 192L, 1L), ("s1", 3L, 0, 202L, 1L), ("s2", 9L, 0, 0L, 0L)))
  }

  test("weightedMix: rate 0 drops all, 100 keeps all, mid-rates track") {
    def kept(rate: Int): Long =
      Sampling.weightedMix(docs, "id", lit(rate)).count()
    assert(kept(0) == 0L && kept(100) == 400L)
    val mid = kept(50)
    assert(mid > 120 && mid < 280, s"rate 50 kept $mid of 400")
    // membership is NESTED: raising the rate only ever adds rows
    import spark.implicits._
    val at30 = Sampling.weightedMix(docs, "id", lit(30))
      .select("id").as[Long].collect().toSet
    val at70 = Sampling.weightedMix(docs, "id", lit(70))
      .select("id").as[Long].collect().toSet
    assert(at30.subsetOf(at70))
  }

  test("weightedMix applies per-stratum rates from a column") {
    val rate = when(col("grp") === "grp0", 100).otherwise(0)
    val out = Sampling.weightedMix(docs, "id", rate)
    assert(out.count() == 100L)
    assert(out.filter(col("grp") =!= "grp0").count() == 0L)
  }

  test("uniformFixed: exactly k rows, deterministic, monotone under growth") {
    val s200 = Sampling.uniformFixed(docs.filter(col("id") <= 200), "id", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s200.size == 50)
    // re-run identical (no RNG)
    val again = Sampling.uniformFixed(docs.filter(col("id") <= 200), "id", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(again == s200)
    // growing the corpus only EVICTS sample members (better hash ranks
    // arrive), never admits a previously-rejected row back
    val s400 = Sampling.uniformFixed(docs, "id", 50)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(s400.size == 50)
    val stillThere = s400.filter(_ <= 200L)
    assert(stillThere.subsetOf(s200))
    // plans as TakeOrderedAndProject — no global sort materialization
    val plan = Sampling.uniformFixed(docs, "id", 50)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(800))
  }

  test("tokenBudgetMix: binding source ~fully kept, others thinned to share") {
    import spark.implicits._
    // grp0: 10k tokens total, grp1: 90k — target 50/50 token shares means
    // grp0 binds (B = 20k): grp0 kept ~100%, grp1 thinned to ~1/9
    val corpus = ((1L to 100L).map(i => (i, "grp0", 100L)) ++
      (101L to 1000L).map(i => (i, "grp1", 100L))).toDF("id", "src", "ntok")
    val out = Sampling.tokenBudgetMix(corpus, "id", "src", col("ntok"),
      Map("grp0" -> 500000L, "grp1" -> 500000L))
    val kept = out.groupBy("src").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(kept("grp0") == 100L, s"binding source must keep all rows: $kept")
    // 1/9 of 900 = 100 expected; hash-uniform within a generous band
    assert(kept("grp1") > 60L && kept("grp1") < 140L, kept.toString)
    // unlisted sources are dropped
    val out2 = Sampling.tokenBudgetMix(corpus, "id", "src", col("ntok"),
      Map("grp0" -> 500000L))
    assert(out2.filter(col("src") =!= "grp0").count() == 0L)
    // determinism: membership identical run-over-run
    assert(out.select("id").collect().map(_.getLong(0)).toSet ==
      Sampling.tokenBudgetMix(corpus, "id", "src", col("ntok"),
        Map("grp0" -> 500000L, "grp1" -> 500000L))
        .select("id").collect().map(_.getLong(0)).toSet)
  }

  test("topFracByGroup keeps ceil(frac*n) best-scored rows per group") {
    import spark.implicits._
    val scored = (1L to 100L).map(i => (i, s"g${i % 2}", (i % 10).toDouble))
      .toDF("id", "grp", "score")
    val out = Sampling.topFracByGroup(scored, "grp", col("score"), "id", 0.3)
      .select("id", "grp", "score").collect()
    // 50 rows per group -> ceil(15) kept each
    assert(out.count(_.getString(1) == "g0") == 15)
    assert(out.count(_.getString(1) == "g1") == 15)
    // every kept score >= every dropped score within its group
    val keptIds = out.map(_.getLong(0)).toSet
    val minKept = out.filter(_.getString(1) == "g0").map(_.getDouble(2)).min
    val maxDropped = (1L to 100L).filter(i => i % 2 == 0 && !keptIds(i))
      .map(i => (i % 10).toDouble).max
    assert(minKept >= maxDropped)
  }

  test("ppsSample: deterministic, partition-invariant, near target size, " +
    "and certainty rows always kept") {
    import spark.implicits._
    // weights 1..200 plus one giant row that trips the k·w >= W cap
    val rows = (1L to 200L).map(i => (i, i)) :+ (999L, 100000L)
    val df = rows.toDF("id", "w")
    val k = 50
    val a = Sampling.ppsSample(df, "id", col("w"), k)
      .collect().map(_.getLong(0)).toSet
    val b = Sampling.ppsSample(df.repartition(7), "id", col("w"), k)
      .collect().map(_.getLong(0)).toSet
    assert(a == b)
    // the capped row (k·w >= W) is in with certainty
    assert(a.contains(999L))
    // realized size near the expected Σ min(1, k·w/W) — loose 3-sigma-ish
    val wsum = rows.map(_._2).sum.toDouble
    val expected = rows.map { case (_, w) => math.min(1.0, k * w / wsum) }.sum
    assert(math.abs(a.size - expected) < 15, s"got ${a.size}, expected ~$expected")
    // heavier rows are kept at a visibly higher rate than light ones
    val heavy = (150L to 200L).count(a.contains).toDouble / 51
    val light = (1L to 50L).count(a.contains).toDouble / 50
    assert(heavy > light)
  }

  test("ppsSample edge cases: k >= population keeps everything with " +
      "certainty; empty input stays empty") {
    import spark.implicits._
    val df = (1L to 20L).map(i => (i, i)).toDF("id", "w")
    // k*w >= W for every row once k >= sum(w)/min(w) = 210
    val all = Sampling.ppsSample(df, "id", col("w"), 210)
      .collect().map(_.getLong(0)).toSet
    assert(all == (1L to 20L).toSet)
    val empty = Seq.empty[(Long, Long)].toDF("id", "w")
    assert(Sampling.ppsSample(empty, "id", col("w"), 5).collect().isEmpty)
  }
}
