package graft.sources

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.{SparkSpec, Tables, Transfer}
import graft.Tables.TableMeta

/** LIVE JDBC round-trip against embedded Derby (in /opt/spark/jars — no
  * network, no new dependency): the DDL strings are executed, the rows
  * actually land, the indexes actually constrain, the identity counter
  * actually advances. This is taps' production sequence — schema, data,
  * indexes, sequences (`lib/taps/operation.rb:245-257`) — run for real,
  * not as option-building. */
class JdbcRoundtripSpec extends AnyFunSuite with SparkSpec {

  private val src = "/root/testdata/sf0.001"
  private val url = "jdbc:derby:memory:graft_it;create=true"

  test("pullToJdbc: schema applied, data landed, watermark = max(pk) — S5/S7 live") {
    val results = Transfer.pullToJdbc(spark, src, url, Seq("nation", "customer"))
    val byTable = results.map(r => r.table -> r).toMap
    val nationRows = Tables.load(spark, src, "nation").count()
    val custRows = Tables.load(spark, src, "customer").count()
    assert(byTable("nation").rows == nationRows)
    assert(byTable("customer").rows == custRows)
    val srcWm = Tables.load(spark, src, "customer").agg(max("c_custkey")).head().getLong(0)
    assert(byTable("customer").watermark.contains(srcWm))
  }

  test("partitioned JDBC read-back equals the source, bit for bit — S4 live") {
    Transfer.pullToJdbc(spark, src, url, Seq("nation"))
    val source = Tables.load(spark, src, "nation")
    val plan = Jdbc.readPlan(url, TableMeta("nation", Seq("n_nationkey")), Some((0L, 24L)), 4)
    assert(plan.parallel)
    val back = Jdbc.read(spark, plan)
      .select(source.schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)): _*)
    assert(back.count() == source.count())
    assert(back.exceptAll(source).isEmpty && source.exceptAll(back).isEmpty)
  }

  test("writeAdaptive: per-partition AIMD batching lands every row and " +
      "type at a tiny seed chunk (many batches, live Derby) — A8/T5 live") {
    val results = Transfer.pullToJdbc(spark, src, url, Seq("customer"),
      batchSize = 16)
    val source = Tables.load(spark, src, "customer")
    assert(results.head.rows == source.count())
    // value fidelity through setObject, integer-exact on both engines:
    // key sum (numeric) + name length sum (strings uncorrupted)
    val backKeys = Jdbc.queryLong(url, "SELECT sum(c_custkey) FROM customer").get
    val backNames = Jdbc.queryLong(url, "SELECT sum(length(c_name)) FROM customer").get
    val srcRow = source.agg(sum("c_custkey"), sum(length(col("c_name")))).head()
    assert(backKeys == srcRow.getLong(0) && backNames == srcRow.getLong(1))
  }

  test("index replay is live: a UNIQUE index rejects a duplicate — S8") {
    Transfer.pullToJdbc(spark, src, url, Seq("nation"),
      indexes = Map("nation" -> Seq(Jdbc.IndexDef("idx_nation_name", Seq("n_name"), unique = true))))
    // n_name is unique in TPC-H nation; inserting a clash must now fail
    val ex = intercept[java.sql.SQLException] {
      Jdbc.execute(url, "INSERT INTO nation (n_nationkey, n_name, n_regionkey) " +
        "VALUES (999, (SELECT n_name FROM nation WHERE n_nationkey = 0), 0)")
    }
    assert(ex.getSQLState.startsWith("23")) // integrity constraint violation
  }

  test("sequence reset is live: insert without pk continues at max+1 — S9") {
    Transfer.pullToJdbc(spark, src, url, Seq("nation"))
    Jdbc.execute(url, "INSERT INTO nation (n_name, n_regionkey) VALUES ('ATLANTIS', 0)")
    val newPk = Jdbc.queryLong(url, "SELECT max(n_nationkey) FROM nation").get
    val srcMax = Tables.load(spark, src, "nation").agg(max("n_nationkey")).head().getInt(0)
    assert(newPk == srcMax + 1)
  }

  test("--indexes-first flips DDL order (pure plan) and still loads live") {
    val df = Tables.load(spark, src, "nation")
    val idx = Seq(Jdbc.IndexDef("idx_nf", Seq("n_regionkey")))
    val meta = Tables.metaOf("nation")
    val (preDeferred, postDeferred) = Jdbc.ddlPlan(df, "nation", meta, url, idx,
      indexesFirst = false, identityPk = true)
    assert(preDeferred.size == 1 && postDeferred.size == 1 &&
      postDeferred.head.startsWith("CREATE INDEX"))
    val (preFirst, postFirst) = Jdbc.ddlPlan(df, "nation", meta, url, idx,
      indexesFirst = true, identityPk = true)
    assert(preFirst.size == 2 && postFirst.isEmpty &&
      preFirst(1).startsWith("CREATE INDEX"))
    val r = Transfer.pullToJdbc(spark, src, url, Seq("nation"),
      indexes = Map("nation" -> idx), indexesFirst = true)
    assert(r.head.rows == df.count())
  }

  test("adaptiveWriteLoop drives real batched INSERTs — S5's hot loop live") {
    Jdbc.dropTableIfExists(url, "loop_target")
    val source = Tables.load(spark, src, "customer")
    Jdbc.execute(url, Jdbc.createTableDdl(source, "loop_target", Seq("c_custkey"), Some(url)))
    val rows = source.collect() // 1500 rows at sf0.001 — a driver-side batch fixture
    val (written, sizer) = Jdbc.adaptiveWriteLoop(
      rows.iterator, Jdbc.batchInserter(url, "loop_target", source.schema),
      graft.streaming.ChunkSizer(100))
    assert(written == rows.length && !sizer.exhausted)
    assert(Jdbc.queryLong(url, "SELECT count(*) FROM loop_target").contains(rows.length.toLong))
    val sumBal = Jdbc.queryLong(url, "SELECT CAST(sum(c_acctbal) AS BIGINT) FROM loop_target").get
    val srcSum = source.agg(sum("c_acctbal").cast("long")).head().getLong(0)
    assert(sumBal == srcSum)
  }
}
