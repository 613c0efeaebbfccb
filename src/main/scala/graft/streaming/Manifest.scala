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
 * every chunk because its writes are not idempotent. Our writes are
 * (overwrite-by-partition Parquet), so the manifest only needs per-table
 * granularity: a table is either completed (with the watermark it finished
 * at) or it re-runs idempotently. Atomic replace (write temp + move) gives
 * the same crash safety as taps' rewrite-whole-file.
 *
 * At scale this is the "completed partitions" manifest: keys become
 * `table/chunk_id` from [[graft.operators.Scan.rangeChunks]] and a
 * 1000-executor job resumes by anti-joining the plan against it
 * (P8 / `resume_skip_completed`).
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
