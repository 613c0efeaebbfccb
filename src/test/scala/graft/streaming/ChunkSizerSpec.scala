package graft.streaming

import org.scalatest.funsuite.AnyFunSuite

/** Pins the controller constants the reference's spec pins
  * (`spec/chunksize_spec.rb:5-40`): ±100, ×2, ÷3, thresholds 0.8/1.1/3.0 s,
  * floor 1, failure reset 10→1 with ≤2 retries. */
class ChunkSizerSpec extends AnyFunSuite {

  test("severe back-off: >3.0s divides by 3 (ceil)") {
    assert(ChunkSizer(1000).observe(4.0).chunksize == 334)
    assert(ChunkSizer(1).observe(100.0).chunksize == 1) // floor holds
  }

  test("mild back-off: >1.1s subtracts 100, floored at 1") {
    assert(ChunkSizer(1000).observe(1.5).chunksize == 900)
    assert(ChunkSizer(50).observe(1.5).chunksize == 1)
  }

  test("fast ramp: <0.8s doubles") {
    assert(ChunkSizer(1000).observe(0.5).chunksize == 2000)
  }

  test("slow ramp: in [0.8, 1.1] adds 100") {
    assert(ChunkSizer(1000).observe(1.0).chunksize == 1100)
    assert(ChunkSizer(1000).observe(0.8).chunksize == 1100)
    assert(ChunkSizer(1000).observe(1.1).chunksize == 1100)
  }

  test("observed time subtracts local db and idle time (taps' diff)") {
    // wall 4.0 but 3.5 was our own overhead → diff 0.5 → ramp, not back-off
    assert(ChunkSizer(1000).observe(4.0, localSecs = 3.0, idleSecs = 0.5).chunksize == 2000)
  }

  test("failure reset: 10 then 1, exhausted after 2 retries (utils.rb:103-111)") {
    val s0 = ChunkSizer(1000)
    val s1 = s0.onFailure
    assert(s1.chunksize == 10 && !s1.exhausted)
    val s2 = s1.onFailure
    assert(s2.chunksize == 1 && !s2.exhausted)
    val s3 = s2.onFailure
    assert(s3.exhausted)
  }

  test("size frozen while in retry state (chunksize.rb retry guard)") {
    val retrying = ChunkSizer(1000).onFailure
    assert(retrying.observe(0.1).chunksize == 10) // not doubled
  }

  test("training window: first-20 mean floors later back-off (data_stream.rb:93-99)") {
    // 20 fast observations from 1: sizes 2,4,... 2^20; running mean ≈ 104857
    var s = ChunkSizer(1)
    (1 to 20).foreach(_ => s = s.observe(0.1))
    val avg = (s.trainedTotal / s.trainedCount).toInt
    // severe back-off would divide by 3, but the trained mean is a FLOOR
    val after = s.observe(10.0)
    assert(after.chunksize == math.max(avg, math.ceil(s.chunksize / 3.0).toInt))
    assert(after.chunksize >= avg)
    // growth above the floor is NOT capped (taps returns max(avg, size))
    val grown = s.observe(0.1)
    assert(grown.chunksize == math.max(avg, s.chunksize * 2))
  }

  test("training floor not applied while in retry state (fetch_chunksize error guard)") {
    var s = ChunkSizer(1)
    (1 to 20).foreach(_ => s = s.observe(0.1)) // trained; avg >> 10
    val retrying = s.onFailure // chunksize 10, retries 1
    assert(retrying.observe(0.1).chunksize == 10) // frozen, no floor boost
  }

  test("property: chunksize never drops below 1 (sweep)") {
    for (size <- Seq(1, 2, 50, 99, 100, 101, 1000, 100000);
         tTenths <- 0 to 60) {
      val t = tTenths / 10.0
      assert(ChunkSizer(size).observe(t).chunksize >= 1, s"size=$size t=$t")
    }
  }
}
