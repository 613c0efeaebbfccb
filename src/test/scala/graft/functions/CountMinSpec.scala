package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Count-min sketch guarantees and merge-tree invariance. */
class CountMinSpec extends AnyFunSuite with SparkSpec {

  private val d = 3
  private val w = 16

  // zipfish token stream: token "t<i>" appears 2^(8 - i) times, i in 0..7,
  // plus a singleton tail — collisions guaranteed at w = 16
  private lazy val stream: Seq[String] =
    (0 to 7).flatMap(i => Seq.fill(1 << (8 - i))(s"t$i")) ++
      (0 until 40).map(i => s"tail$i")

  private def truth: Map[String, Long] =
    stream.groupBy(identity).view.mapValues(_.size.toLong).toMap

  /** Plain-Scala reference: every cell is the sum of colliding counts. */
  private def referenceCells: Array[Long] = {
    val cells = new Array[Long](d * w)
    truth.foreach { case (t, n) =>
      (0 until d).foreach(r => cells(r * w + CountMin.bucket(t, r, w)) += n)
    }
    cells
  }

  private def sketchCells(partitions: Int): Array[Long] = {
    import spark.implicits._
    spark.createDataset(stream).repartition(partitions).toDF("token")
      .agg(CountMin.sketch(col("token"), d, w).as("cells"))
      .collect().head.getSeq[Long](0).toArray
  }

  test("sketch cells are bit-equal to the relational reference under 1/4/32 partitionings") {
    val want = referenceCells.toSeq
    Seq(1, 4, 32).foreach { p =>
      assert(sketchCells(p).toSeq == want, s"partitions=$p")
    }
  }

  test("estimates never undercount and are exact for collision-free tokens") {
    val cells = sketchCells(8)
    def est(t: String): Long =
      (0 until d).map(r => cells(r * w + CountMin.bucket(t, r, w))).min
    truth.foreach { case (t, n) => assert(est(t) >= n, s"token=$t") }
    // a token whose buckets nobody else hits in at least one row is exact
    val collisionFree = truth.keys.filter { t =>
      (0 until d).exists { r =>
        val b = CountMin.bucket(t, r, w)
        truth.keys.forall(o => o == t || CountMin.bucket(o, r, w) != b)
      }
    }
    collisionFree.foreach(t => assert(est(t) == truth(t), s"token=$t"))
  }

  test("absent tokens estimate at most the classical 2N/w bound (spot check)") {
    val cells = sketchCells(8)
    val n = stream.size.toLong
    def est(t: String): Long =
      (0 until d).map(r => cells(r * w + CountMin.bucket(t, r, w))).min
    // d independent rows: expected overcount N/w; assert the loose hard
    // spot-check that at least one of several absent probes sits under
    // 2N/w (the probabilistic guarantee made concrete on this stream)
    val probes = (0 until 8).map(i => s"absent$i")
    assert(probes.exists(t => est(t) <= 2 * n / w))
    probes.foreach(t => assert(est(t) >= 0))
  }

  test("null tokens are ignored") {
    import spark.implicits._
    val withNulls = (stream.map(Option(_)) ++ Seq.fill(10)(Option.empty[String]))
    val cells = spark.createDataset(withNulls).toDF("token")
      .agg(CountMin.sketch(col("token"), d, w).as("cells"))
      .collect().head.getSeq[Long](0).toArray
    assert(cells.toSeq == referenceCells.toSeq)
    assert(cells.sum == d * stream.size)
  }
}
