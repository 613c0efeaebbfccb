package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Accounting identities over the round-12 product-analytics keys —
  * each key is oracle-verified cross-engine, but engine and oracle share
  * a formula, so a shared mistake would agree with itself; these tie the
  * outputs back to independently-computed totals from the raw fixture
  * (the mutual-witness pattern GraphInvariantSpec uses for the graph
  * family). All at sf0.001. */
class AnalyticsInvariantSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def q(name: String) = SparkEntry.queries(name)(spark, dir)

  private lazy val userDays: Map[java.time.LocalDate, Set[Long]] =
    graft.Tables.load(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id")).distinct()
      .collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  test("growth accounting closes: per-day active classes sum to DAU, " +
      "new sums to the distinct-user total, churned(d) = dau(d-1) - retained(d)") {
    val rows = q("ext_growth_accounting").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getString(1), r.getLong(2)))
    val byDay = rows.groupBy(_._1)
      .view.mapValues(_.map(t => t._2 -> t._3).toMap).toMap
    val allUsers = userDays.values.flatten.toSet
    // new across all days = every user exactly once
    assert(rows.filter(_._2 == "new").map(_._3).sum == allUsers.size)
    userDays.foreach { case (d, us) =>
      val m = byDay.getOrElse(d, Map.empty)
      val active = m.getOrElse("new", 0L) + m.getOrElse("retained", 0L) +
        m.getOrElse("resurrected", 0L)
      assert(active == us.size, s"day $d active classes must sum to DAU")
      val prev = userDays.get(d.minusDays(1)).map(_.size.toLong).getOrElse(0L)
      val churn = byDay.get(d).flatMap(_.get("churned")).getOrElse(0L)
      if (userDays.contains(d.minusDays(1)))
        assert(churn == prev - m.getOrElse("retained", 0L),
          s"day $d churn identity")
    }
  }

  test("DAU/WAU: wau >= dau every day, equality on the first active day, " +
      "and wau(d) equals the brute-force 7-day union") {
    val rows = q("ext_dau_wau").collect()
      .map(r => (r.getDate(0).toLocalDate, r.getLong(1), r.getLong(2)))
    assert(rows.nonEmpty)
    val first = userDays.keys.min(Ordering.by[java.time.LocalDate, Long](
      _.toEpochDay))
    rows.foreach { case (d, dau, wau) =>
      assert(dau == userDays(d).size, s"dau $d")
      val want = (0 to 6).flatMap(i =>
        userDays.getOrElse(d.minusDays(i), Set.empty)).toSet.size
      assert(wau == want, s"wau $d")
      assert(wau >= dau)
      if (d == first) assert(wau == dau)
    }
  }

  test("streak lengths: total mass equals the active (user, day) count " +
      "and no streak exceeds the calendar span") {
    val rows = q("ext_streak_lengths").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val totalActive = userDays.values.map(_.size).sum
    assert(rows.map { case (len, n, _) => len * n }.sum == totalActive)
    val span = userDays.keys.map(_.toEpochDay).max -
      userDays.keys.map(_.toEpochDay).min + 1
    assert(rows.forall(_._1 <= span))
  }

  test("first touch: users partition across channels, converted bounded, " +
      "and the channel totals match a brute-force first-event fold") {
    val rows = q("ext_first_touch").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val ev = graft.Tables.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2), r.getLong(3)))
    val firstOf = ev.groupBy(_._1).view.mapValues(
      _.minBy(t => (t._3.getTime, t._4))._2).toMap
    val want = firstOf.values.groupBy(identity).view.mapValues(_.size.toLong)
    assert(rows.map(_._2).sum == firstOf.size)
    rows.foreach { case (ch, n, conv) =>
      assert(n == want(ch), s"channel $ch user count")
      assert(conv <= n)
    }
  }

  test("RFM segments: cell counts sum to the user total and every " +
      "quintile dimension partitions users into near-equal fifths") {
    val rows = q("ext_rfm_segments").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2), r.getLong(3)))
    val nUsers = userDays.values.flatten.toSet.size.toLong
    assert(rows.map(_._4).sum == nUsers)
    Seq[((Int, Int, Int, Long)) => Int](_._1, _._2, _._3).foreach { dim =>
      val per = rows.groupBy(dim).view.mapValues(_.map(_._4).sum)
      assert(per.keySet == Set(1, 2, 3, 4, 5))
      assert(per.values.max - per.values.min <= 1, s"ntile balance: $per")
    }
  }

  test("revenue deciles: cents and part counts close against the raw " +
      "table and shares are a monotone non-increasing partition of ~1") {
    val rows = q("ext_revenue_deciles").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val li = graft.Tables.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_extendedprice")).collect()
      .map(r => (r.getLong(0), math.floor(r.getDouble(1) * 100.0 + 0.5).toLong))
    assert(rows.map(_._2).sum == li.map(_._1).distinct.length)
    assert(rows.map(_._3).sum == li.map(_._2).sum)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4)
    // decile 1 holds the top parts: shares never increase down the table
    rows.sliding(2).foreach { case Array((_, _, _, s1), (_, _, _, s2)) =>
      assert(s1 >= s2 - 1e-9)
    }
  }

  test("A/B chi2: cells partition the user base and chi2 is finite " +
      "non-negative on the fixture") {
    val r = q("ext_ab_chi2").collect()(0)
    val (a, b, c, d) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(a + b + c + d == userDays.values.flatten.toSet.size)
    assert(!r.isNullAt(4) && r.getDouble(4) >= 0.0)
  }

  test("round-13 keys: Gini in [0,1) and re-derivable from its own " +
      "totals; KM survival starts <= 1, is monotone nonincreasing, and " +
      "n_at_risk is monotone nonincreasing in duration") {
    val g = q("ext_gini_revenue").head()
    val (n, tot, gini) = (g.getLong(0), g.getLong(1), g.getDouble(2))
    assert(n > 0 && tot > 0 && gini >= 0.0 && gini < 1.0)
    val km = q("ext_survival_km").orderBy(col("duration_m")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4)))
    assert(km.nonEmpty)
    assert(km.head._5 <= 1.0 + 1e-9)
    km.sliding(2).foreach {
      case Array((_, _, _, nr1, s1), (_, _, _, nr2, s2)) =>
        assert(s2 <= s1 + 1e-9, "survival must be nonincreasing")
        assert(nr2 <= nr1, "n_at_risk must be nonincreasing")
      case _ => ()
    }
    // every step's d <= its n_at_risk (can't lose more than are at risk)
    km.foreach { case (_, d, _, nr, _) => assert(d <= nr) }
  }

  test("round-13 keys: bipartite-projection cosine in (0,1]; MAD " +
      "outlier counts bounded by n; contamination-matrix Jaccard " +
      "consistent with its own counts; cohort LTV cumsums close") {
    q("ext_bipartite_projection").collect().foreach { r =>
      val (co, nu, nv, cos) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(co >= 1 && co <= math.min(nu, nv))
      assert(cos > 0.0 && cos <= 1.0 + 1e-9)
    }
    q("ext_mad_by_type").collect().foreach { r =>
      assert(r.getLong(4) <= r.getLong(3), "outliers <= n")
    }
    q("ext_contamination_matrix").collect().foreach { r =>
      val (sh, na, nb, j) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))
      assert(sh <= math.min(na, nb))
      val want = sh.toDouble / (na + nb - sh).toDouble
      assert(math.abs(j - want) < 1e-6)
    }
    val ltv = q("ext_cohort_ltv").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(3), r.getLong(4)))
    ltv.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      val cums = sorted.scanLeft(0L)(_ + _._3).drop(1)
      assert(sorted.map(_._4).toSeq == cums.toSeq,
        "cum_rev_fp must equal the running sum of rev_fp")
    }
  }

  test("hour uniformity: per-type totals close against raw event counts " +
      "and the chi2 numerator re-derives from its own row") {
    val rows = q("ext_hour_uniformity").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val want = graft.Tables.load(spark, dir, "events")
      .groupBy(col("event_type")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(rows.map(t => t._1 -> t._2).toMap == want)
    rows.foreach { case (_, n, nActive, num) =>
      assert(nActive <= 24 && num >= 0)
      // chi2_num >= the absent-hour floor (24 - active) * n^2
      assert(num >= (24 - nActive) * n * n)
    }
  }
}
