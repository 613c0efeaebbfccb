package graft

import org.apache.spark.sql.SparkSession

/**
 * Executable whole-database pull — the `taps pull` CLI face
 * (reference `bin/taps`, `lib/taps/cli.rb:120-173`) over [[Transfer]].
 *
 * Usage:
 *   sbt "runMain graft.Pull <srcDir> <dst> <manifestPath> \
 *        [--filter <regex>] [--exclude a,b] [--tables a,b] [--indexes-first]
 *        [--codec zstd|snappy|gzip|lz4|none] [--chunksize n]"
 *
 * `--chunksize` (`lib/taps/cli.rb:135`) sets the INITIAL batch size for a
 * `jdbc:` destination — the [[streaming.ChunkSizer]] seed each write
 * partition's AIMD controller retunes from ([[sources.Jdbc.writeAdaptive]];
 * default 1000, the reference's DEFAULT_CHUNKSIZE). Clamped to a floor of
 * 10 like the reference CLI (`lib/taps/cli.rb:135`). File destinations
 * ignore it: Parquet chunking is row-group/AQE-governed.
 *
 * `dst` is a directory (Parquet landing) or a `jdbc:` URL — the latter runs
 * the live taps sequence per table: schema, data, indexes, sequences
 * ([[Transfer.pullToJdbc]]); `--indexes-first` replays indexes BEFORE the
 * data (`lib/taps/cli.rb:133`, `lib/taps/operation.rb:249-254`).
 *
 * `--tables` is the reference's sugar for an exact-name alternation regex
 * (`lib/taps/cli.rb:137-141`); resume comes free from the manifest: re-run
 * the same command after a crash and completed tables are skipped (P8),
 * while interrupted ones re-run idempotently (T3).
 */
object Pull {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: Pull <srcDir> <dstDir> <manifestPath> [--filter re] [--exclude a,b] [--tables a,b]")
    val Array(src, dst, manifest) = args.take(3)
    def opt(flag: String): Option[String] =
      args.sliding(2).collectFirst { case Array(`flag`, v) => v }
    val filter = opt("--tables")
      .map(ts => operators.CatalogOps.tablesToRegex(ts.split(",").toSeq))
      .orElse(opt("--filter"))
    val exclude = opt("--exclude").map(_.split(",").toSeq).getOrElse(Nil)
    // floor of 10, like the reference (`lib/taps/cli.rb:135` —
    // `v.to_i < 10 ? 10 : v.to_i`)
    val chunkSize = opt("--chunksize").map(v => math.max(10, v.toInt))
      .getOrElse(streaming.ChunkSizer.Default)

    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = LocalTuning(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val t0 = System.nanoTime()
    val results =
      if (dst.startsWith("jdbc:")) {
        val m0 = streaming.Manifest.load(manifest)
        val todo = Transfer.plan(Tables.names, filter, exclude, m0)
        Transfer.pullToJdbc(spark, src, dst, todo,
          indexesFirst = args.contains("--indexes-first"),
          batchSize = chunkSize)
      } else Transfer.pull(spark, src, dst, manifest,
        filterRegex = filter, exclude = exclude,
        codec = opt("--codec").getOrElse("zstd"))
    val secs = (System.nanoTime() - t0) / 1e9
    val moved = results.filterNot(_.skipped)
    val rows = moved.map(_.rows).sum
    results.sortBy(_.table).foreach { r =>
      val status = if (r.skipped) "skipped" else f"${r.rows}%d rows"
      println(f"[pull] ${r.table}%-12s $status${r.watermark.map(w => s"  watermark=$w").getOrElse("")}")
    }
    println(f"[pull] ${moved.size} tables, $rows%d rows in $secs%.1fs " +
      f"(${rows / math.max(secs, 0.001)}%.0f rows/s)")
    spark.stop()
  }
}
