package graft.sources

import java.sql.{Connection, DriverManager, SQLException}

import org.apache.spark.sql.jdbc.{JdbcDialect, JdbcDialects, JdbcType}
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.SparkSpec

/** SECOND-DIALECT coverage for the JDBC sink (r12 verdict task 7). Only
  * Derby ships in this container (zero egress — no H2/HSQLDB jar), so the
  * second dialect is a REGISTERED `JdbcDialect` + `java.sql.Driver` pair
  * ("jdbc:graftpg:") that delegates storage to Derby while imposing the
  * PostgreSQL-shaped behaviors the sink's hardening exists for:
  *
  *  - its own `getJDBCType` mapping (VARCHAR(4000) strings, BIGINT longs)
  *    — exercises [[Jdbc.createTableDdl]]/[[Jdbc.sqlTypeFor]] off the
  *    non-default dialect branch;
  *  - its own `quoteIdentifier` — exercises [[Jdbc.insertPlan]]'s
  *    dialect-driven column/table quoting away from DerbyDialect;
  *  - `setObject(i, null)` REJECTION (the real PostgreSQL driver throws
  *    "can't infer the SQL type … use setNull"): the probed-types setNull
  *    bind path is load-bearing here, not merely tolerated;
  *  - duplicate keys surfaced with H2's legacy SQLState 23001 instead of
  *    23505 — exercises the second spelling [[Jdbc]] tolerates, while NOT
  *    NULL violations keep their own state and must stay loud.
  */
class JdbcSecondDialectSpec extends AnyFunSuite with SparkSpec {

  private val pgUrl = "jdbc:graftpg:memory:graft_pg;create=true"

  // -- the second dialect ---------------------------------------------------

  private object PgLikeDialect extends JdbcDialect {
    override def canHandle(url: String): Boolean = url.startsWith("jdbc:graftpg:")
    // PostgreSQL-style double-quoting (no case folding by the dialect);
    // distinct from Derby's to prove insertPlan reads THIS dialect
    override def quoteIdentifier(colName: String): String = "\"" + colName + "\""
    override def getJDBCType(dt: DataType): Option[JdbcType] = dt match {
      case StringType => Some(JdbcType("VARCHAR(4000)", java.sql.Types.VARCHAR))
      case LongType => Some(JdbcType("BIGINT", java.sql.Types.BIGINT))
      case IntegerType => Some(JdbcType("INTEGER", java.sql.Types.INTEGER))
      case DoubleType => Some(JdbcType("DOUBLE PRECISION", java.sql.Types.DOUBLE))
      case d: DecimalType =>
        Some(JdbcType(s"DECIMAL(${d.precision},${d.scale})", java.sql.Types.DECIMAL))
      case _ => None
    }
  }

  private def unwrapInvoke(target: AnyRef, m: java.lang.reflect.Method,
                           args: Array[AnyRef]): AnyRef =
    try m.invoke(target, args: _*)
    catch { case e: java.lang.reflect.InvocationTargetException => throw e.getCause }

  /** PostgreSQL-strict PreparedStatement: setObject(i, null) throws (the
    * pg driver's "can't infer the SQL type" — SQLState 42P18), and any
    * integrity violation from execute/executeBatch is re-reported with
    * `dupState` (23001 emulates H2's legacy unique-violation state). */
  private def strictPs(ps: java.sql.PreparedStatement,
                       dupState: String): java.sql.PreparedStatement =
    java.lang.reflect.Proxy.newProxyInstance(
      classOf[java.sql.PreparedStatement].getClassLoader,
      Array[Class[_]](classOf[java.sql.PreparedStatement]),
      (_, m, a) => {
        val args = if (a == null) Array.empty[AnyRef] else a
        if (m.getName == "setObject" && args.length == 2 && args(1) == null)
          throw new SQLException(
            "can't infer the SQL type to use for an instance of null; " +
              "use setNull or setObject with an explicit Types value", "42P18")
        try unwrapInvoke(ps, m, args)
        catch {
          case e: SQLException
              if {
                var cur = e; var dup = false
                while (cur != null && !dup) {
                  if ("23505" == cur.getSQLState) dup = true
                  cur = cur.getNextException
                }
                dup
              } =>
            throw new SQLException("duplicate key (pg-like)", dupState)
        }
      }).asInstanceOf[java.sql.PreparedStatement]

  private def strictConn(real: Connection, dupState: String): Connection =
    java.lang.reflect.Proxy.newProxyInstance(
      classOf[Connection].getClassLoader,
      Array[Class[_]](classOf[Connection]),
      (_, m, a) => {
        val args = if (a == null) Array.empty[AnyRef] else a
        val res = unwrapInvoke(real, m, args)
        if (m.getName == "prepareStatement")
          strictPs(res.asInstanceOf[java.sql.PreparedStatement], dupState)
        else res
      }).asInstanceOf[Connection]

  /** The registered driver behind jdbc:graftpg: — delegates storage to
    * Derby, wraps every connection in the strict proxy. */
  private class GraftPgDriver extends java.sql.Driver {
    override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:graftpg:")
    override def connect(url: String, info: java.util.Properties): Connection =
      if (!acceptsURL(url)) null
      else strictConn(
        DriverManager.getConnection(url.replace("jdbc:graftpg:", "jdbc:derby:")),
        dupState = "23001")
    override def getMajorVersion: Int = 1
    override def getMinorVersion: Int = 0
    override def getPropertyInfo(url: String, info: java.util.Properties) =
      Array.empty[java.sql.DriverPropertyInfo]
    override def jdbcCompliant(): Boolean = false
    override def getParentLogger = throw new java.sql.SQLFeatureNotSupportedException()
  }

  private lazy val registered: Unit = {
    JdbcDialects.registerDialect(PgLikeDialect)
    DriverManager.registerDriver(new GraftPgDriver)
  }

  test("full round-trip through the second dialect: dialect DDL types, " +
      "dialect-quoted insert plan, setNull-only binding, NULL column lands") {
    registered
    import org.apache.spark.sql.Row
    assert(JdbcDialects.get(pgUrl) eq PgLikeDialect)
    Jdbc.dropTableIfExists(pgUrl, "pg_rt")
    // DDL through the dialect: strings must come out VARCHAR(4000), longs
    // BIGINT (the PgLike mapping), not Derby's CLOB default
    val df = spark.range(0).selectExpr("id AS id", "CAST(null AS STRING) AS name",
      "CAST(id AS DOUBLE) AS score")
    val ddl = Jdbc.createTableDdl(df, "pg_rt", Seq("id"), Some(pgUrl))
    assert(ddl.contains("VARCHAR(4000)") && ddl.contains("BIGINT"), ddl)
    Jdbc.execute(pgUrl, ddl)
    val (insertSql, types) = Jdbc.insertPlan(pgUrl, "pg_rt", Seq("id", "name", "score"))
    // canonical names quoted through PgLikeDialect (Derby canonicalizes to
    // upper case; the QUOTING style is the dialect's)
    assert(insertSql.contains("\"ID\"") && insertSql.contains("\"NAME\""), insertSql)
    // every 7th name NULL: with setObject(null) forbidden by the strict
    // proxy, only the probed-types setNull path can land these rows
    val rows = (0 until 50).map(i =>
      Row(i.toLong, if (i % 7 == 0) null else s"n_$i", i * 0.5))
    val written = Jdbc.writePartitionAdaptive(rows.iterator, insertSql, types,
      () => DriverManager.getConnection(pgUrl), "pg_rt", chunkSize = 16,
      tolerateDuplicates = true)
    assert(written == 50)
    assert(Jdbc.queryLong(pgUrl, "SELECT count(*) FROM pg_rt").contains(50L))
    assert(Jdbc.queryLong(pgUrl,
      "SELECT count(*) FROM pg_rt WHERE name IS NULL").contains(8L))
  }

  test("task-retry convergence under H2-style SQLState 23001 duplicates; " +
      "NOT NULL violations stay loud through the second dialect") {
    registered
    import org.apache.spark.sql.Row
    Jdbc.dropTableIfExists(pgUrl, "pg_dup")
    Jdbc.execute(pgUrl,
      "CREATE TABLE pg_dup (id INT NOT NULL, val INT NOT NULL, PRIMARY KEY (id))")
    val (insertSql, types) = Jdbc.insertPlan(pgUrl, "pg_dup", Seq("id", "val"))
    val connect = () => DriverManager.getConnection(pgUrl)
    // first attempt commits a prefix; the retried task re-sends everything
    // — duplicates now surface as bare 23001 (no 23505 anywhere in the
    // chain) and must still be swallowed row-by-row
    Jdbc.writePartitionAdaptive((0 until 30).map(i => Row(i, i)).iterator,
      insertSql, types, connect, "pg_dup", 10, tolerateDuplicates = true)
    val retried = Jdbc.writePartitionAdaptive(
      (0 until 60).map(i => Row(i, i)).iterator,
      insertSql, types, connect, "pg_dup", 10, tolerateDuplicates = true)
    assert(retried == 60)
    assert(Jdbc.queryLong(pgUrl, "SELECT count(*) FROM pg_dup").contains(60L))
    // NOT NULL through the same dialect: loud, not swallowed
    val ex = intercept[SQLException] {
      Jdbc.writePartitionAdaptive(
        (60 until 70).map(i => Row(i, if (i == 64) null else i)).iterator,
        insertSql, types, connect, "pg_dup", 10, tolerateDuplicates = true)
    }
    assert(ex != null)
    assert(Jdbc.queryLong(pgUrl,
      "SELECT count(*) FROM pg_dup WHERE id = 64").contains(0L))
  }

  test("writeAdaptive end-to-end over DriverManager with the registered " +
      "second-dialect driver (executor-side connections)") {
    registered
    import org.apache.spark.sql.functions._
    Jdbc.dropTableIfExists(pgUrl, "pg_bulk")
    val src = graft.Tables.load(spark, "/root/testdata/sf0.001", "nation")
      .select(col("n_nationkey").cast("int").as("nk"), col("n_name").as("nm"))
    Jdbc.execute(pgUrl, Jdbc.createTableDdl(src, "pg_bulk", Seq("nk"), Some(pgUrl)))
    Jdbc.writeAdaptive(src.repartition(2), pgUrl, "pg_bulk", chunkSize = 7)
    assert(Jdbc.queryLong(pgUrl, "SELECT count(*) FROM pg_bulk").contains(25L))
    assert(Jdbc.queryLong(pgUrl, "SELECT sum(nk) FROM pg_bulk").contains(300L))
  }
}
