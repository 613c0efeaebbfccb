package graft.streaming

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The session-file semantics of T2 (resume manifest): round-trip, pending
  * subtraction, crash-safe atomic save. */
class ManifestSpec extends AnyFunSuite {

  test("save/load round-trips, including keys needing JSON escapes") {
    val dir = Files.createTempDirectory("manifest").toString
    val path = s"$dir/state.json"
    val m = Manifest.empty
      .complete("orders", 15000L)
      .complete("line\"item\\x", -1L)
    m.save(path)
    assert(Manifest.load(path) == m)
  }

  test("load of a missing file is the empty manifest (fresh run)") {
    assert(Manifest.load("/tmp/does-not-exist-manifest.json") == Manifest.empty)
  }

  test("pending = plan minus completed (P8)") {
    val m = Manifest.empty.complete("region", 5L).complete("nation", 25L)
    assert(m.pending(Seq("region", "nation", "customer", "orders")) ==
      Seq("customer", "orders"))
    assert(m.watermark("nation").contains(25L))
    assert(m.watermark("orders").isEmpty)
  }

  test("save is an atomic replace (old content fully superseded)") {
    val dir = Files.createTempDirectory("manifest").toString
    val path = s"$dir/state.json"
    Manifest.empty.complete("a", 1L).complete("b", 2L).save(path)
    Manifest.empty.complete("c", 3L).save(path)
    assert(Manifest.load(path) == Manifest.empty.complete("c", 3L))
  }
}
