package graft.sources

import java.sql.{Connection, DriverManager}

import org.apache.spark.sql.{DataFrame, Row, SaveMode, SparkSession}
import org.apache.spark.sql.jdbc.JdbcDialects
import org.apache.spark.sql.types._
import graft.Tables.TableMeta

/**
 * JDBC edge (SURVEY §7 step 9) — the production boundary where taps
 * actually lived: relational DB in, relational DB out.
 *
 * taps' two access paths become Spark's native partitioned JDBC read:
 *  - keyset pagination (S4) generalizes to `partitionColumn/lowerBound/
 *    upperBound/numPartitions` — N disjoint pk ranges scanned in parallel,
 *    the O(n) property of the watermark scan times N-way parallelism;
 *  - offset pagination (S3, the no-pk fallback) has no parallel analogue —
 *    a single-partition read, exactly as slow as taps documents
 *    (`README.rdoc:36`); we surface it honestly as `numPartitions=1`.
 *
 * The write side carries taps' bulk-import semantics (S5): multi-row
 * batches (`batchsize` ≙ chunksize, tunable by the ChunkSizer controller),
 * DDL replay (S6/S7) via `createTableColumnTypes`/`createTableOptions`,
 * and index/sequence pass-through (S8/S9) as post-write statements.
 *
 * No live database ships in this container, so the wrappers are thin and
 * the OPTION-BUILDING logic — what to partition on, how many partitions,
 * what DDL to emit — is pure and unit-tested.
 */
/** Thrown by [[Jdbc.insertPlan]]'s own metadata probe when a DataFrame
  * column is absent from a table that WAS found — a dedicated type so the
  * raw-vs-quoted table-spelling fallback can tell it apart from
  * table-not-found without string-matching driver messages (which some
  * drivers return as null). */
final class ColumnMismatchException(msg: String)
  extends java.sql.SQLException(msg)

object Jdbc {

  /** Spark `JdbcDialect` for DuckDB — Spark ships none, and the DuckDB
    * JDBC driver's metadata misleads the default mapping two ways
    * (measured against duckdb_jdbc in the local cache):
    *  - BIGINT columns report as NUMERIC precision 20, so a plain
    *    `spark.read.jdbc` surfaces them as DECIMAL(20,0) — which then
    *    fails downstream dialects (Derby: "invalid type for identity
    *    column") and taxes every comparison with decimal math;
    *  - HUGEINT (int128) reports as JAVA_OBJECT, which Spark rejects
    *    outright (UNRECOGNIZED_SQL_TYPE) — DECIMAL(38,0) holds 38 of
    *    int128's 39 digits exactly; a value past 10^38−1 fails LOUDLY at
    *    the read boundary (ANSI NUMERIC_VALUE_OUT_OF_RANGE, spec-pinned),
    *    never silently truncates.
    * Registered once at object init; `canHandle` keys on the URL prefix
    * so every other engine keeps its stock dialect. */
  private object DuckDbDialect extends org.apache.spark.sql.jdbc.JdbcDialect {
    override def canHandle(url: String): Boolean =
      url.startsWith("jdbc:duckdb:")
    override def getCatalystType(sqlType: Int, typeName: String, size: Int,
                                 md: MetadataBuilder): Option[DataType] =
      typeName match {
        case "BIGINT" => Some(LongType)
        case "HUGEINT" => Some(DecimalType(38, 0))
        case "UBIGINT" => Some(DecimalType(20, 0))
        case _ => None
      }
  }
  JdbcDialects.registerDialect(DuckDbDialect)

  /** Partitioning plan for a JDBC read, derived from pk metadata the same
    * way `DataStream.factory` chooses an access path
    * (`lib/taps/data_stream.rb:228-242`). */
  final case class ReadPlan(options: Map[String, String], parallel: Boolean)

  /** Build read options: keyset tables range-partition on the pk; no-pk /
    * composite-pk tables fall back to a single partition (taps' offset
    * path — document the pathology, don't hide it). `bounds` come from a
    * cheap `SELECT min(pk), max(pk)` (taps' verify_stream does the same
    * max(pk) probe, `lib/taps/data_stream.rb:329-336`). */
  def readPlan(url: String, meta: TableMeta, bounds: Option[(Long, Long)],
               numPartitions: Int, fetchSize: Int = 1000): ReadPlan = {
    val base = Map(
      "url" -> url,
      "dbtable" -> meta.name,
      "fetchsize" -> fetchSize.toString)
    (meta.primaryKey, bounds) match {
      case (Seq(pk), Some((lo, hi))) if meta.singleIntPk =>
        ReadPlan(base ++ Map(
          "partitionColumn" -> pk,
          "lowerBound" -> lo.toString,
          "upperBound" -> hi.toString,
          "numPartitions" -> numPartitions.toString), parallel = true)
      case _ =>
        ReadPlan(base + ("numPartitions" -> "1"), parallel = false)
    }
  }

  def read(spark: SparkSession, plan: ReadPlan): DataFrame =
    spark.read.format("jdbc").options(plan.options).load()

  /** Bulk-import options (S5): `batchsize` is taps' chunksize — start at
    * the reference default (1000) and let a ChunkSizer retune it. */
  def writeOptions(url: String, table: String, batchSize: Int = graft.streaming.ChunkSizer.Default,
                   isolation: String = "READ_COMMITTED"): Map[String, String] =
    Map(
      "url" -> url,
      "dbtable" -> table,
      "batchsize" -> batchSize.toString,
      "isolationLevel" -> isolation)

  def write(df: DataFrame, opts: Map[String, String], mode: SaveMode = SaveMode.Append): Unit =
    df.write.format("jdbc").options(opts).mode(mode).save()

  /** The PRODUCTION bulk-import sink: distributed writes where every
    * partition drives its own [[adaptiveWriteLoop]] — each executor task
    * opens one connection and retunes its batch size against ITS observed
    * round-trip (taps' ~1 s/batch operating point, per stream), which is
    * the scale-correct reading of the reference's single-stream AIMD:
    * 1000 executors each adapt independently to their share of the
    * target's throughput instead of sharing one global constant. `append`
    * semantics; at-least-once like taps (a task retry after a partial
    * commit re-sends the partition — [[graft.Transfer.verifyTransfer]] /
    * repair converges, T3). Per-batch commits bound the target's
    * transaction size (each batch ≙ one taps POST), which means a Spark
    * TASK retry re-inserts the rows its predecessor already committed —
    * on a PK-constrained target (which [[graft.Transfer.pullToJdbc]]
    * creates) those re-sends surface as duplicate-key violations, so the
    * failure path degrades to per-row inserts that SWALLOW duplicate
    * keys ONLY (SQLState 23505/23001 — the one violation a task retry
    * can manufacture) and keep everything else loud, including other
    * integrity violations (NOT NULL/CHECK/FK mean bad data, not a retry)
    * (`tolerateDuplicates = false` restores fail-fast for targets where
    * a duplicate key means corruption, not a retry). A batch failure
    * also taps-style resets the controller 10 → 1 AND reopens the
    * connection when the old one died mid-batch (the broken-pipe
    * reconnect of `lib/taps/utils.rb:103-111`); exhausted retries (2)
    * fail the task loudly.
    *
    * Identifiers and nulls follow the target's own truth, the way
    * Spark's built-in JDBC writer does: the INSERT's column list uses
    * the CANONICAL names read back from the target (matched
    * case-insensitively, quoted through the url's `JdbcDialect`), and
    * NULLs bind via `setNull` with the column's probed
    * `java.sql.Types` code — `setObject(i, null)` makes many drivers
    * (PostgreSQL notably) throw "can't infer the SQL type". */
  def writeAdaptive(df: DataFrame, url: String, table: String,
                    chunkSize: Int = graft.streaming.ChunkSizer.Default,
                    tolerateDuplicates: Boolean = true): Unit = {
    val (insertSql, types) = insertPlan(url, table, df.schema.fieldNames)
    df.foreachPartition { (rows: Iterator[Row]) =>
      writePartitionAdaptive(rows, insertSql, types,
        () => DriverManager.getConnection(url), table, chunkSize,
        tolerateDuplicates)
      ()
    }
  }

  /** Driver-side probe behind [[writeAdaptive]]: the INSERT statement
    * (target-canonical column names, dialect-quoted) and the per-column
    * `java.sql.Types` codes for null binding — both read from the
    * target's own metadata via a zero-row SELECT, so they are right for
    * whatever DDL actually created the table. DataFrame columns absent
    * from the target fail loudly here, before any executor connects. */
  def insertPlan(url: String, table: String,
                 cols: Seq[String]): (String, Array[Int]) = {
    val dialect = JdbcDialects.get(url)
    // The table identifier goes through the same dialect as the columns,
    // but quoting an identifier the DDL created UNQUOTED breaks on
    // case-folding engines (Derby folds unquoted names to upper case, so
    // "graft_rt" ≠ GRAFT_RT) — probe the raw spelling first, and fall
    // back to the per-part dialect-quoted form for case-sensitive or
    // reserved-word table names. The INSERT reuses whichever spelling
    // the target accepted.
    val quoted = table.split('.').map(dialect.quoteIdentifier).mkString(".")
    val spellings = if (quoted == table) Seq(table) else Seq(table, quoted)
    val (tableSql, resolved) = withConnection(url) { conn =>
      def probe(t: String) = {
        val rs = conn.prepareStatement(s"SELECT * FROM $t WHERE 1=0")
          .executeQuery()
        val md = rs.getMetaData
        val byLower = (1 to md.getColumnCount).map { i =>
          md.getColumnName(i).toLowerCase -> ((md.getColumnName(i), md.getColumnType(i)))
        }.toMap
        t -> cols.map(c => byLower.getOrElse(c.toLowerCase,
          throw new ColumnMismatchException(
            s"column $c not found in $t (target has: " +
              s"${byLower.keys.toSeq.sorted.mkString(", ")})")))
      }
      // table-not-found, by SQLState walked through the next-exception
      // chain: Derby 42X05, PostgreSQL 42P01, MySQL/H2/SQLServer 42S02,
      // H2 legacy S0002 — plus SQLSyntaxErrorException for dialects
      // whose driver types the miss but uses a nonstandard state. The
      // own-probe ColumnMismatchException is a dedicated type so a
      // column mismatch on a FOUND table never falls through, and no
      // driver message string (which may be null) is ever inspected.
      def tableNotFound(e: Throwable): Boolean = e match {
        case _: ColumnMismatchException => false
        case sq: java.sql.SQLException =>
          var cur = sq; var hops = 0
          while (cur != null && hops < 10) {
            val st = cur.getSQLState
            if (st == "42X05" || st == "42P01" || st == "42S02" ||
              st == "S0002") return true
            cur = cur.getNextException; hops += 1
          }
          sq.isInstanceOf[java.sql.SQLSyntaxErrorException]
        case _ => false
      }
      val first = scala.util.Try(probe(spellings.head))
      spellings.tail.foldLeft(first) {
        (acc, t) => acc.recoverWith {
          // only a MISSING-table failure falls through to the quoted
          // spelling; a column mismatch on a found table stays loud
          case e if tableNotFound(e) => scala.util.Try(probe(t))
        }
      } match {
        case scala.util.Success(v) => v
        case scala.util.Failure(e) => first match {
          // when every spelling fails, surface the RAW-spelling error
          // (the root cause the caller named) with the fallback probe's
          // failure attached as suppressed — not the other way round
          case scala.util.Failure(f) if !(f eq e) =>
            f.addSuppressed(e); throw f
          case _ => throw e
        }
      }
    }
    val insertSql = s"INSERT INTO $tableSql " +
      s"(${resolved.map(c => dialect.quoteIdentifier(c._1)).mkString(", ")}) " +
      s"VALUES (${resolved.map(_ => "?").mkString(", ")})"
    (insertSql, resolved.map(_._2).toArray)
  }

  /** Integrity-constraint detection across driver spellings: a direct
    * `SQLIntegrityConstraintViolationException`, any exception in the
    * chain with SQLState class 23 (integrity constraint violation), or
    * either buried inside a `BatchUpdateException`'s next-exception
    * chain (Derby reports batch duplicate keys as XJ208 → 23505). Used
    * only to pick the per-row CONVERGENCE path; what that path may
    * silently skip is the strictly narrower [[isDuplicateKey]]. */
  private def isIntegrityViolation(e: java.sql.SQLException): Boolean = {
    var cur = e
    var hops = 0
    while (cur != null && hops < 10) {
      if (cur.isInstanceOf[java.sql.SQLIntegrityConstraintViolationException])
        return true
      val st = cur.getSQLState
      if (st != null && st.startsWith("23")) return true
      cur = cur.getNextException
      hops += 1
    }
    false
  }

  /** UNIQUE-key violation specifically: SQLState 23505 (ANSI unique
    * violation — Derby, PostgreSQL, H2, HSQLDB) or 23001 (H2's
    * referential/unique legacy code), walked through the same
    * next-exception chain. A Spark task retry re-sending committed rows
    * can ONLY manufacture duplicate keys; NOT NULL / CHECK / FK
    * violations (23502/23503/23513/…) mean the DATA is bad and must
    * stay loud — swallowing them would be silent row loss. */
  private def isDuplicateKey(e: java.sql.SQLException): Boolean = {
    var cur = e
    var hops = 0
    while (cur != null && hops < 10) {
      val st = cur.getSQLState
      if (st == "23505" || st == "23001") return true
      cur = cur.getNextException
      hops += 1
    }
    false
  }

  /** One partition's adaptive write — the executor-side body of
    * [[writeAdaptive]], with the connection FACTORY injectable so a spec
    * can hand it connections that die mid-write and watch the loop
    * reconnect and converge. Failure path per batch: rollback, reopen
    * the connection if the old one is dead, rethrow into
    * [[adaptiveWriteLoop]] (which resets the controller and re-chunks
    * the same rows smaller); duplicate-key violations instead degrade to
    * per-row inserts that swallow ONLY integrity violations (task-retry
    * convergence). Returns rows written (duplicates skipped count as
    * written — they are on the target). */
  def writePartitionAdaptive(rows: Iterator[Row], insertSql: String,
                             types: Array[Int], connect: () => Connection,
                             table: String, chunkSize: Int,
                             tolerateDuplicates: Boolean): Long = {
    if (!rows.hasNext) return 0L
    val width = types.length
    var conn: Connection = null
    var ps: java.sql.PreparedStatement = null
    def reconnect(): Unit = {
      if (conn != null) try conn.close() catch { case _: Exception => () }
      conn = connect()
      conn.setAutoCommit(false)
      ps = conn.prepareStatement(insertSql)
    }
    def bind(r: Row): Unit = {
      var i = 0
      while (i < width) {
        if (r.isNullAt(i)) ps.setNull(i + 1, types(i))
        else ps.setObject(i + 1, r.get(i))
        i += 1
      }
    }
    // taps' broken pipe: every failure exit runs this BEFORE the
    // exception reaches adaptiveWriteLoop, so the retry never starts on
    // a dead connection (shared by the batch path AND the per-row path)
    def repairAndRethrow(e: Exception): Nothing = {
      try conn.rollback() catch { case _: Exception => () }
      val dead = try conn.isClosed || !conn.isValid(2)
        catch { case _: Exception => true }
      if (dead) {
        try reconnect()
        catch { case _: Exception => () } // retry loop will fail loudly
      }
      throw e
    }
    var lastFailure: Exception = null
    reconnect()
    try {
      val (written, fin) = adaptiveWriteLoop[Row](rows, (batch, _) => {
        try {
          ps.clearBatch()
          batch.foreach { r => bind(r); ps.addBatch() }
          ps.executeBatch()
          conn.commit()
        } catch {
          case e: java.sql.SQLException
              if tolerateDuplicates && isIntegrityViolation(e) =>
            // a retried task re-sending committed rows: converge row by
            // row — commit per row so a violation can't poison siblings
            // on engines that abort the whole txn on any error. Only
            // DUPLICATE KEYS are skipped silently (they are on the
            // target); any other integrity violation is bad data and
            // rethrows loudly.
            try conn.rollback() catch { case _: Exception => () }
            batch.foreach { r =>
              try { bind(r); ps.execute(); conn.commit() }
              catch {
                case re: java.sql.SQLException if isDuplicateKey(re) =>
                  try conn.rollback() catch { case _: Exception => () }
                case other: Exception =>
                  lastFailure = other
                  repairAndRethrow(other)
              }
            }
          case e: Exception =>
            lastFailure = e
            repairAndRethrow(e)
        }
      }, graft.streaming.ChunkSizer(chunkSize))
      if (fin.exhausted) {
        val abort = new java.sql.SQLException(
          s"adaptive write to $table aborted after retries " +
            s"($written rows committed in this partition)")
        if (lastFailure != null) abort.initCause(lastFailure)
        throw abort
      }
      written
    } finally {
      if (conn != null) try conn.close() catch { case _: Exception => () }
    }
  }

  /** taps' hot loop, generalized: drive a sequence of batched writes with
    * the AIMD [[graft.streaming.ChunkSizer]] — each batch's observed wall
    * time retunes the next batch size toward the ~1 s/batch operating point
    * (`lib/taps/operation.rb:480-548`). `write` receives (batch, batchSize);
    * a thrown exception is taps' broken pipe: the controller resets 10→1 and
    * the batch retries, aborting after the controller is exhausted.
    * Returns (rows written, final controller state). Pure orchestration —
    * inject `write` (a JDBC executor in production, a probe in tests) and
    * `clock` (nanoTime in production, synthetic in tests). */
  def adaptiveWriteLoop[T](rows: Iterator[T],
                           write: (Seq[T], Int) => Unit,
                           sizer0: graft.streaming.ChunkSizer = graft.streaming.ChunkSizer(),
                           clock: () => Long = System.nanoTime): (Long, graft.streaming.ChunkSizer) = {
    var sizer = sizer0
    var written = 0L
    var pending: Vector[T] = Vector.empty // failed batch awaiting retry
    def nextBatch(): Vector[T] =
      if (pending.nonEmpty) {
        // re-chunk the failed rows at the reduced size (taps re-sends the
        // stream from the watermark with the reset chunksize)
        val (b, rest) = pending.splitAt(sizer.chunksize)
        pending = rest
        b
      } else {
        val b = Vector.newBuilder[T]
        var i = 0
        while (i < sizer.chunksize && rows.hasNext) { b += rows.next(); i += 1 }
        b.result()
      }
    var batch = nextBatch()
    while (batch.nonEmpty && !sizer.exhausted) {
      val t0 = clock()
      try {
        write(batch, sizer.chunksize)
        written += batch.size
        sizer = sizer.observe((clock() - t0) / 1e9)
      } catch {
        case _: Exception =>
          sizer = sizer.onFailure   // 10 → 1 → exhausted, like taps
          pending = batch ++ pending // the same rows retry, re-chunked smaller
      }
      batch = nextBatch()
    }
    (written, sizer)
  }

  /** S6/S7 schema replay: CREATE TABLE DDL from the DataFrame schema —
    * `Schema.dump_table`'s Spark face (`lib/taps/schema.rb:15-30`).
    *
    * With a `url`, column types come from the target's `JdbcDialect` (what
    * Sequel's schema translation does for taps), so the statement actually
    * executes on that database; without one, Spark's own DDL types are
    * emitted (a dump for humans, not for a specific engine). `identityPk`
    * marks a single integer pk `GENERATED BY DEFAULT AS IDENTITY` — the
    * auto-increment behavior whose counter S9's sequence reset re-syncs
    * after a bulk load of explicit pk values. */
  def createTableDdl(df: DataFrame, table: String, primaryKey: Seq[String],
                     url: Option[String] = None, identityPk: Boolean = false,
                     typeOverrides: Map[String, String] = Map.empty): String = {
    val cols = url match {
      case None => df.schema.toDDL
      case Some(u) =>
        df.schema.fields.map { f =>
          val isPk = primaryKey.contains(f.name)
          // auto-increment spelling is ENGINE dialect, not standard SQL
          // (taps reads it from Sequel's per-adapter schema dump,
          // lib/taps/schema.rb:15-30): identity-column engines (Derby/
          // DB2/H2) inline the IDENTITY clause; explicit-sequence engines
          // (DuckDB, classic Postgres serial) get a PLAIN column here and
          // attach the sequence DEFAULT after the load in
          // [[resetPkSequenceSql]] — taps' own order (schema, data,
          // indexes, THEN sequences, lib/taps/operation.rb:245-257), and
          // the only order DuckDB accepts (a sequence with a dependent
          // default can be neither replaced nor restarted in place)
          val identity = if (identityPk && isPk && primaryKey.size == 1 &&
              !usesExplicitSequence(u))
            " GENERATED BY DEFAULT AS IDENTITY" else ""
          val notNull = if (isPk || !f.nullable) " NOT NULL" else ""
          val tpe = typeOverrides.getOrElse(f.name, sqlTypeFor(u, f.dataType))
          s"${f.name} $tpe$identity$notNull"
        }.mkString(", ")
    }
    val pk = if (primaryKey.nonEmpty) s", PRIMARY KEY (${primaryKey.mkString(", ")})" else ""
    s"CREATE TABLE $table ($cols$pk)"
  }

  /** Target-dialect SQL type for a Spark type: the registered `JdbcDialect`
    * decides first (Derby says CLOB for strings, Postgres says TEXT), with
    * the standard JDBC mapping as fallback. Complex types (arrays, structs)
    * have no relational shape and fail loudly — a JDBC destination is not
    * where embeddings go. */
  def sqlTypeFor(url: String, dt: DataType): String =
    JdbcDialects.get(url).getJDBCType(dt).map(_.databaseTypeDefinition).getOrElse(dt match {
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case DoubleType => "DOUBLE PRECISION"
      case FloatType => "REAL"
      case ShortType | ByteType => "SMALLINT"
      case BooleanType => "BOOLEAN"
      case StringType => "TEXT"
      case BinaryType => "BLOB"
      case TimestampType => "TIMESTAMP"
      case DateType => "DATE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case other => throw new IllegalArgumentException(
        s"no JDBC type for Spark type ${other.sql} (url=$url)")
    })

  /** S8 index pass-through: executed against the target AFTER the data load
    * (taps' deferred-index optimization, `lib/taps/operation.rb:249-254`;
    * `--indexes-first` flips the order). */
  def createIndexDdl(table: String, indexName: String, columns: Seq[String],
                     unique: Boolean = false): String = {
    val u = if (unique) "UNIQUE " else ""
    s"CREATE ${u}INDEX $indexName ON $table (${columns.mkString(", ")})"
  }

  /** S9 sequence reset (PostgreSQL form): re-sync the pk sequence after a
    * bulk load (`lib/taps/schema.rb:74-80`). */
  def resetSequenceSql(table: String, pk: String): String =
    s"SELECT setval(pg_get_serial_sequence('$table', '$pk'), " +
      s"coalesce((SELECT max($pk) FROM $table), 0) + 1, false)"

  /** S9, identity-column dialects (Derby/DB2 family): restart the pk's
    * identity counter past the bulk-loaded maximum — same effect as
    * Postgres' setval, different spelling. */
  def restartIdentitySql(table: String, pk: String, next: Long): String =
    s"ALTER TABLE $table ALTER COLUMN $pk RESTART WITH $next"

  /** Engines whose pk auto-increment is an EXPLICIT sequence the loader
    * must CREATE post-load and attach as the column DEFAULT — DuckDB only:
    * DuckDB has no serial/identity shorthand, so the sequence object is
    * ours to make. Classic-serial Postgres is NOT in this class — serial
    * creates its own backing sequence at DDL time and the reset is
    * `setval` ([[resetSequenceSql]]), dispatched separately below.
    * Identity-column engines (Derby/DB2/H2) take the ALTER…RESTART branch.
    * The cross-engine split taps hides behind Sequel adapters
    * (lib/taps/schema.rb:74-80). */
  def usesExplicitSequence(url: String): Boolean =
    url.startsWith("jdbc:duckdb:")

  /** Deterministic name for the pk's backing sequence on explicit-sequence
    * engines (the postgres serial convention). */
  def pkSequenceName(table: String, pk: String): String =
    s"${table}_${pk}_seq"

  /** S9 across the engine families: the statement(s) that make the next
    * auto-generated pk land at `next` after a bulk load. Three dialects:
    * DuckDB (create our own sequence + attach as DEFAULT), classic-serial
    * Postgres (`setval` on the serial's self-created backing sequence —
    * Postgres does NOT accept ALTER…RESTART on a serial column), and the
    * identity-column family (Derby/DB2/H2: ALTER…RESTART).
    *
    * LIVE-ENGINE COVERAGE (r18 audit): the DuckDB branch executes against
    * a real DuckDB database (JdbcDuckDbSpec) and the identity branch
    * against embedded Derby (JdbcDuckDbSpec, TransferSpec); the Postgres
    * `setval` branch has NO live engine behind it in this environment —
    * no Postgres server, and the offline dependency cache carries no
    * Postgres-compatible embedded engine (H2/HSQLDB absent; checked
    * r18). Its contract is therefore pinned as emitted-SQL strings per
    * URL family in JdbcSpec ("resetPkSequenceSql dispatches per
    * dialect") — if a Postgres-compat jar ever becomes reachable, wire
    * it through the same live round-trip the other two branches get. */
  def resetPkSequenceSql(url: String, table: String, pk: String,
                         next: Long): Seq[String] =
    if (usesExplicitSequence(url)) {
      // the sequence is CREATED here, post-load, already pointing past
      // the bulk watermark, then attached as the pk's DEFAULT — the taps
      // sequence step (schema, data, indexes, THEN sequences); creating
      // it pre-load would freeze it: DuckDB refuses to replace or
      // restart a sequence that a column DEFAULT depends on
      val seq = pkSequenceName(table, pk)
      Seq(s"CREATE SEQUENCE $seq START WITH $next",
        s"ALTER TABLE $table ALTER COLUMN $pk SET DEFAULT nextval('$seq')")
    } else if (url.startsWith("jdbc:postgresql:"))
      // honor the caller-supplied `next` exactly like the other two
      // branches (a caller reserving a gap must get it on every dialect);
      // the table-derived variant (resetSequenceSql, = taps' max+1
      // behavior) remains for callers that want the watermark default
      Seq(s"SELECT setval(pg_get_serial_sequence('$table', '$pk'), " +
        s"$next, false)")
    else Seq(restartIdentitySql(table, pk, next))

  /** DROP SEQUENCE that tolerates absence — the explicit-sequence twin of
    * [[dropTableIfExists]] for re-runnable pulls. */
  def dropSequenceIfExists(url: String, name: String): Unit =
    try execute(url, s"DROP SEQUENCE $name")
    catch { case _: java.sql.SQLException => () }

  // ---------------------------------------------------------------------
  // Live execution — the statements above, actually run over java.sql.
  // taps opens a fresh connection per request (`lib/taps/db_session.rb:13-17`);
  // each helper here does the same: connect, execute, close.
  // ---------------------------------------------------------------------

  // Derby (the embedded engine used for integration tests) writes derby.log
  // to derby.system.home — point it at tmp once, before the first connection
  private lazy val derbyHome: Unit = {
    if (System.getProperty("derby.system.home") == null)
      System.setProperty("derby.system.home", System.getProperty("java.io.tmpdir", "/tmp"))
  }

  /** Per-request connection, like taps' `Sequel.connect` block. */
  def withConnection[T](url: String)(f: Connection => T): T = {
    derbyHome
    val conn = DriverManager.getConnection(url)
    try f(conn) finally conn.close()
  }

  /** Execute one DDL/DML statement against the target. */
  def execute(url: String, sql: String): Unit =
    withConnection(url)(_.createStatement().execute(sql))

  /** DROP TABLE that tolerates absence (Derby has no IF EXISTS). */
  def dropTableIfExists(url: String, table: String): Unit =
    try execute(url, s"DROP TABLE $table")
    catch { case _: java.sql.SQLException => () }

  /** Single-value query helper (counts, max(pk) watermarks) — the
    * destination-side probes taps' verify_stream makes
    * (`lib/taps/data_stream.rb:329-336`). */
  def queryLong(url: String, sql: String): Option[Long] =
    withConnection(url) { conn =>
      val rs = conn.createStatement().executeQuery(sql)
      if (rs.next() && rs.getObject(1) != null) Some(rs.getLong(1)) else None
    }

  /** A secondary index to replay on the destination (S8) —
    * `Schema.indexes_individual`'s row shape (`lib/taps/schema.rb:42-52`). */
  final case class IndexDef(name: String, columns: Seq[String], unique: Boolean = false)

  /** The ordered DDL around one table's data load, as (before-data,
    * after-data) statement lists. Default order is taps' pull sequence —
    * schema, data, indexes, sequences (`lib/taps/operation.rb:245-257`);
    * `indexesFirst` replays indexes BEFORE the data (`--indexes-first`,
    * `lib/taps/cli.rb:133`, `lib/taps/operation.rb:249-254`) for engines
    * whose bulk loaders backfill indexes cheaply. Pure — unit-testable
    * without a database; the sequence-reset statement is appended by the
    * caller once the loaded watermark is known. */
  def ddlPlan(df: DataFrame, table: String, meta: TableMeta, url: String,
              indexes: Seq[IndexDef], indexesFirst: Boolean,
              identityPk: Boolean,
              typeOverrides: Map[String, String] = Map.empty): (Seq[String], Seq[String]) = {
    val create = createTableDdl(df, table, meta.primaryKey, Some(url),
      identityPk = identityPk && meta.singleIntPk, typeOverrides = typeOverrides)
    val idx = indexes.map(i => createIndexDdl(table, i.name, i.columns, i.unique))
    if (indexesFirst) (create +: idx, Nil) else (Seq(create), idx)
  }

  /** Indexed string columns can't be the dialect's LOB default (Derby: "CLOB
    * may not be used in CREATE INDEX") — they need a bounded VARCHAR. taps
    * gets the length from the source schema dump (`lib/taps/schema.rb:15-30`);
    * Parquet carries no length, so we probe max(length) in ONE aggregate over
    * the columns that need it and size with 2× headroom (min 256). */
  def indexedVarcharOverrides(df: DataFrame, indexes: Seq[IndexDef]): Map[String, String] = {
    import org.apache.spark.sql.functions.{coalesce, col, length, lit, max}
    val stringCols = indexes.flatMap(_.columns).distinct
      .filter(c => df.schema.fields.exists(f => f.name == c && f.dataType == StringType))
    if (stringCols.isEmpty) Map.empty
    else {
      val probes = stringCols.map(c => coalesce(max(length(col(c))), lit(0)).as(c))
      val row = df.agg(probes.head, probes.tail: _*).head()
      stringCols.zipWithIndex.map { case (c, i) =>
        c -> s"VARCHAR(${math.max(256, 2 * row.getInt(i))})"
      }.toMap
    }
  }

  /** Batched INSERT executor over a fresh per-call connection — the live
    * sink for [[adaptiveWriteLoop]] (each batch ≙ one taps POST; the
    * controller sizes the next one from the observed wall time). */
  def batchInserter(url: String, table: String, schema: StructType): (Seq[Row], Int) => Unit = {
    val placeholders = schema.fields.map(_ => "?").mkString(", ")
    val insert = s"INSERT INTO $table (${schema.fieldNames.mkString(", ")}) VALUES ($placeholders)"
    (batch: Seq[Row], _: Int) =>
      withConnection(url) { conn =>
        val ps = conn.prepareStatement(insert)
        batch.foreach { row =>
          schema.fields.zipWithIndex.foreach { case (_, i) =>
            ps.setObject(i + 1, row.get(i))
          }
          ps.addBatch()
        }
        ps.executeBatch()
      }
  }
}
