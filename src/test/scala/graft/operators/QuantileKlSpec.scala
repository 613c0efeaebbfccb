package graft.operators

import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkEntry, SparkSpec}

/** Pins the grid-based exact quantile key and the KL-divergence key
  * against brute-force Scala folds on the sf0.001 fixture — both are
  * inline plan compositions, so a shared engine/oracle formula mistake
  * would otherwise pass the gate unnoticed. */
class QuantileKlSpec extends AnyFunSuite with SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("ext_group_quantiles equals the sorted-list rank definition " +
      "q_p = value at rank ceil(p*n/100)") {
    val got = SparkEntry.queries("ext_group_quantiles")(spark, dir)
      .collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4))))
      .toMap

    val rows = graft.Tables.load(spark, dir, "lineitem")
      .select("l_returnflag", "l_quantity")
      .collect().map(r => (r.getString(0), r.getDouble(1)))
    val want = rows.groupBy(_._1).map { case (f, rs) =>
      val sorted = rs.map(_._2).sorted
      val n = sorted.length.toLong
      def q(p: Int): Double = sorted(((p * n + 99) / 100).toInt - 1)
      f -> ((n, q(50), q(90), q(99)))
    }
    assert(got == want)
  }

  test("ext_kl_sources equals the token-ordered brute-force fold and is " +
      "zero-ish only when a source matches the corpus blend") {
    val got = SparkEntry.queries("ext_kl_sources")(spark, dir)
      .collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap

    val docs = graft.Tables.load(spark, dir, "documents")
      .select("source", "text")
      .collect().map(r => (r.getString(0), r.getString(1)))
    val pairs = docs.flatMap { case (src, text) =>
      text.toLowerCase.split(" ", -1).filter(_.nonEmpty).map(src -> _)
    }
    val cst = pairs.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val ct = pairs.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val ns = pairs.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val nTot = pairs.length.toLong
    val want = ns.map { case (src, n) =>
      // same IEEE op order as the plan: terms folded in token order from
      // a 0.0 seed, each term (cst/ns) * ln((cst*N) / (ct*ns))
      val kl = cst.keys.filter(_._1 == src).map(_._2).toSeq.sorted
        .foldLeft(0.0) { (acc, tok) =>
          val c = cst((src, tok))
          acc + (c.toDouble / n.toDouble) *
            math.log((c.toDouble * nTot.toDouble) /
              (ct(tok).toDouble * n.toDouble))
        }
      src -> ((n, kl))
    }
    assert(got.keySet == want.keySet)
    want.foreach { case (src, (n, kl)) =>
      assert(got(src)._1 == n, s"n_tokens for $src")
      // identical IEEE ops + identical fold order -> bit-identical before
      // rounding, so the HALF_UP 6-decimal round must match exactly
      val rounded = BigDecimal(kl)
        .setScale(6, scala.math.BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(got(src)._2 == rounded, s"kl for $src")
    }
    // KL is non-negative and strictly positive for at least one source
    // (the fixture sources have distinct token mixes)
    assert(got.values.forall(_._2 >= 0.0))
    assert(got.values.exists(_._2 > 0.0))
  }
}
