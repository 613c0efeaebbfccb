package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.Tables.TableMeta

/** Option-building logic of the JDBC edge (no live DB in the container). */
class JdbcSpec extends AnyFunSuite {

  private val url = "jdbc:postgresql://host/db"

  test("single-int-pk table range-partitions (keyset generalization, S4)") {
    val plan = Jdbc.readPlan(url, TableMeta("orders", Seq("o_orderkey")),
      Some((1L, 1500000L)), numPartitions = 64)
    assert(plan.parallel)
    assert(plan.options("partitionColumn") == "o_orderkey")
    assert(plan.options("lowerBound") == "1")
    assert(plan.options("upperBound") == "1500000")
    assert(plan.options("numPartitions") == "64")
  }

  test("composite-pk / no-pk tables fall back to one partition (S3 pathology)") {
    val comp = Jdbc.readPlan(url, TableMeta("lineitem", Seq("l_orderkey", "l_linenumber")),
      Some((1L, 100L)), 64)
    assert(!comp.parallel && comp.options("numPartitions") == "1")
    assert(!comp.options.contains("partitionColumn"))
    val nopk = Jdbc.readPlan(url, TableMeta("log", Nil), None, 64)
    assert(!nopk.parallel)
  }

  test("unknown bounds also forces the fallback (no pk probe possible)") {
    assert(!Jdbc.readPlan(url, TableMeta("orders", Seq("o_orderkey")), None, 8).parallel)
  }

  test("write options carry taps' bulk-import batch semantics (S5)") {
    val o = Jdbc.writeOptions(url, "orders", batchSize = 2000)
    assert(o("batchsize") == "2000" && o("dbtable") == "orders")
  }

  test("DDL replay: CREATE TABLE with pk, index, sequence reset (S6-S9)") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("id", "name")
    val ddl = Jdbc.createTableDdl(df, "t", Seq("id"))
    assert(ddl.startsWith("CREATE TABLE t (") && ddl.endsWith(", PRIMARY KEY (id))"))
    assert(ddl.contains("id BIGINT") && ddl.contains("name STRING"))
    assert(Jdbc.createIndexDdl("t", "t_name_idx", Seq("name")) ==
      "CREATE INDEX t_name_idx ON t (name)")
    assert(Jdbc.createIndexDdl("t", "t_id_u", Seq("id"), unique = true)
      .startsWith("CREATE UNIQUE INDEX"))
    assert(Jdbc.resetSequenceSql("t", "id").contains("pg_get_serial_sequence"))
  }
}
