package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.Suite

/** Shared local SparkSession for all specs — one JVM-wide session (sbt forks
  * a single test JVM), small parallelism, UTC, AQE on as in production. */
trait SparkSpec { self: Suite =>
  lazy val spark: SparkSession = SparkSpec.session
}

object SparkSpec {
  lazy val session: SparkSession = LocalTuning(SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4"))
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
