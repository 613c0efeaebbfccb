package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/**
 * Resumable transfer manifest — the batch analogue of taps' session file
 * (T2: `Operation#store_session` serializes `{stream_state,
 * completed_tables, …}` to JSON, `lib/taps/operation.rb:69-87`; resume path
 * `lib/taps/cli.rb:175-193`).
 *
 * taps checkpoints a per-table cursor (offset or last-pk watermark) after
 * every chunk because its writes are not idempotent. Ours are
 * (overwrite-by-partition Parquet), so keys come at two granularities:
 * per-table (`table`, [[graft.Transfer.pull]] — a table either completed or
 * re-runs idempotently) and per-chunk (`table/chunk_id` from
 * [[graft.operators.Scan.rangeBounds]], [[graft.Transfer.pullChunked]] — a
 * crash mid-table loses one range, matching taps' after-every-chunk save).
 * Atomic replace (write temp + move) gives the same crash safety as taps'
 * rewrite-whole-file. At 1000 executors resume is the same anti-join of the
 * plan against the completed set (P8 / `resume_skip_completed`).
 */
final case class Manifest(completed: Map[String, Long]) {

  def isCompleted(key: String): Boolean = completed.contains(key)

  def complete(key: String, watermark: Long): Manifest =
    copy(completed = completed + (key -> watermark))

  def watermark(key: String): Option[Long] = completed.get(key)

  /** Pending = plan minus completed (taps' table-plan subtraction, P8). */
  def pending(plan: Seq[String]): Seq[String] = plan.filterNot(isCompleted)

  def save(path: String): Unit = {
    val body = completed.toSeq.sortBy(_._1)
      .map { case (k, v) => s"""  "${Manifest.esc(k)}": $v""" }
      .mkString("{\n", ",\n", "\n}")
    val tmp = Paths.get(path + ".tmp")
    Files.write(tmp, body.getBytes("UTF-8"))
    Files.move(tmp, Paths.get(path), StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}

object Manifest {
  val empty: Manifest = Manifest(Map.empty)

  private def esc(s: String): String =
    s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"; case c => c.toString }

  /** Tolerant flat-JSON reader for the manifest's own shape. */
  def load(path: String): Manifest = {
    val p = Paths.get(path)
    if (!Files.exists(p)) empty
    else {
      val body = Files.readAllLines(p).asScala.mkString("\n")
      val entry = """"((?:[^"\\]|\\.)*)"\s*:\s*(-?\d+)""".r
      Manifest(entry.findAllMatchIn(body).map { m =>
        m.group(1).replace("\\\"", "\"").replace("\\\\", "\\") -> m.group(2).toLong
      }.toMap)
    }
  }
}
