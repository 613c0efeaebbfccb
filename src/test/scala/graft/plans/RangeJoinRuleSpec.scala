package graft.plans

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec
import graft.operators.Temporal

/** The range-join rewrite rule: plan shape (nested loop → hash join),
  * exact result preservation, bound-operator variants, and the
  * no-re-rewrite guard. */
class RangeJoinRuleSpec extends AnyFunSuite with SparkSpec {

  private def withRule[T](width: Long)(f: => T): T = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule
    spark.conf.set(RangeJoinRule.ConfKey, width.toString)
    try f finally {
      spark.conf.unset(RangeJoinRule.ConfKey)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRule)
    }
  }

  private def eventsView(): Unit =
    graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .createOrReplaceTempView("ev_rjr")

  private val hourUs = 3600L * 1000 * 1000
  private val q =
    """SELECT p.event_id AS purchase_id, c.event_id AS click_id
      |FROM (SELECT event_id, user_id, unix_micros(ts) AS t
      |      FROM ev_rjr WHERE event_type = 'click') c
      |JOIN (SELECT event_id, user_id, unix_micros(ts) AS lo,
      |             unix_micros(ts) + 3600000000 AS hi
      |      FROM ev_rjr WHERE event_type = 'purchase') p
      |  ON c.user_id = p.user_id AND c.t >= p.lo AND c.t < p.hi""".stripMargin

  test("keyed inequality join gains the bin equi-key under the rule") {
    // with a user_id equi-key Spark already hash-joins, but the range
    // conjuncts ride as post-join predicates: every same-user pair is
    // materialized — per-key O(n·m), the skew bomb at scale. The rewrite
    // adds the bin to the HASH KEY, so only same-bin pairs form.
    eventsView()
    val before = spark.sql(q).queryExecution.executedPlan.toString
    assert(!before.contains("__graft_bin"))
    withRule(hourUs) {
      val after = spark.sql(q).queryExecution.executedPlan.toString
      assert(after.contains("__graft_bin"), after.take(600))
      assert(!after.contains("BroadcastNestedLoopJoin") &&
        !after.contains("CartesianProduct"), after.take(600))
    }
  }

  private val qNoKey = q.replace("ON c.user_id = p.user_id AND", "ON")

  test("keyless inequality join: nested loop becomes a hash join") {
    eventsView()
    val before = spark.sql(qNoKey).queryExecution.executedPlan.toString
    assert(before.contains("BroadcastNestedLoopJoin"), before.take(400))
    withRule(hourUs) {
      val after = spark.sql(qNoKey).queryExecution.executedPlan.toString
      assert(!after.contains("BroadcastNestedLoopJoin") &&
        !after.contains("CartesianProduct"), after.take(600))
    }
  }

  test("keyless rewritten results equal the nested-loop results exactly") {
    eventsView()
    val base = spark.sql(qNoKey).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val rewritten = withRule(hourUs) {
      spark.sql(qNoKey).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(base.nonEmpty && rewritten == base)
  }

  test("rewritten results equal the nested-loop results exactly") {
    eventsView()
    val base = spark.sql(q).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val rewritten = withRule(hourUs) {
      spark.sql(q).collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(base.nonEmpty, "fixture produced no in-window pairs")
    assert(rewritten == base)
  }

  test("negative domains, keyless joins and <= upper bounds stay exact") {
    import spark.implicits._
    val pts = Seq((1L, -15L), (2L, -5L), (3L, 0L), (4L, 7L), (5L, 8L))
      .toDF("pid", "t")
    val iv = Seq((10L, -10L, 0L), (11L, 0L, 8L)).toDF("iid", "lo", "hi")
    def strict = pts.join(iv, pts("t") >= iv("lo") && pts("t") < iv("hi"))
      .select("pid", "iid")
    def inclusive = pts.join(iv, pts("t") >= iv("lo") && pts("t") <= iv("hi"))
      .select("pid", "iid")
    val (sBase, iBase) = (strict.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
      inclusive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    val (sRew, iRew) = withRule(4L) {
      // the rewrite must actually FIRE for both bound spellings — without
      // these the result equalities would pass vacuously on a no-op rule
      assert(strict.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      assert(inclusive.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      (strict.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq,
        inclusive.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq)
    }
    assert(sBase == Seq((2L, 10L), (3L, 11L), (4L, 11L)))
    assert(iBase == (sBase :+ (3L -> 10L) :+ (5L -> 11L)).sorted) // endpoints join
    assert(sRew == sBase && iRew == iBase)
  }

  test("reversed-operand spellings (lo <= t AND hi > t) rewrite and stay exact") {
    import spark.implicits._
    val pts = Seq((1L, -15L), (2L, -5L), (3L, 0L), (4L, 7L), (5L, 8L))
      .toDF("pid", "t")
    val iv = Seq((10L, -10L, 0L), (11L, 0L, 8L)).toDF("iid", "lo", "hi")
    def q = pts.join(iv, iv("lo") <= pts("t") && iv("hi") > pts("t"))
      .select("pid", "iid")
    val base = q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    val rew = withRule(4L) {
      assert(q.queryExecution.optimizedPlan.toString.contains("__graft_bin"))
      q.collect().map(r => (r.getLong(0), r.getLong(1))).sorted.toSeq
    }
    assert(base == Seq((2L, 10L), (3L, 11L), (4L, 11L)) && rew == base)
  }

  test("guard: the manual binned operator's plan is not re-rewritten") {
    import spark.implicits._
    val pts = Seq((1L, 1L, 5L)).toDF("pid", "k", "t")
    val iv = Seq((2L, 1L, 0L, 10L)).toDF("iid", "k", "lo", "hi")
    withRule(4L) {
      val plan = Temporal.rangeJoinBinned(pts, iv, Seq("k"), "t", "lo", "hi", 4L)
        .queryExecution.optimizedPlan.toString
      assert(!plan.contains("__graft_bin"), plan.take(600))
    }
  }

  test("inert without the conf even when registered") {
    eventsView()
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ RangeJoinRule
    try {
      val plan = spark.sql(q).queryExecution.executedPlan.toString
      assert(!plan.contains("__graft_bin"))
    } finally spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ eq RangeJoinRule)
  }
}
