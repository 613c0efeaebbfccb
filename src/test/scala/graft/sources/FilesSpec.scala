package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** CSV / JSON-lines interchange round-trips, including the hostile cases
  * (embedded delimiters, quotes, newlines; double bit-exactness). */
class FilesSpec extends AnyFunSuite with SparkSpec {

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(name).resolve("data").toString

  test("CSV round-trips embedded delimiters, quotes and newlines") {
    import spark.implicits._
    val src = Seq(
      (1L, "plain"),
      (2L, "comma, inside"),
      (3L, "quote \" inside"),
      (4L, "line\nbreak"),
      (5L, "both \"x\", and\nmore")
    ).toDF("id", "text")
    val path = tmp("graft-csv")
    Files.writeCsv(src, path)
    val back = Files.readCsv(spark, path, src.schema)
    assert(back.orderBy("id").collect().toSeq == src.orderBy("id").collect().toSeq)
  }

  test("JSON-lines round-trips doubles bit-exactly") {
    import spark.implicits._
    val src = Seq((1L, 0.1), (2L, 1.0 / 3.0), (3L, 6.02214076e23))
      .toDF("id", "x")
    val path = tmp("graft-json")
    Files.writeJson(src, path)
    val back = Files.readJson(spark, path, src.schema)
    assert(back.orderBy("id").collect().toSeq == src.orderBy("id").collect().toSeq)
  }
}
