package graft

import java.nio.file.Files

import graft.streaming.StreamDemo

/** T1/T8: AvailableNow file-source run is complete and idempotent — a second
  * run (fresh checkpoint, same sink) appends nothing thanks to the
  * anti-join-before-append sink. */
class StreamDemoSpec extends SparkSpec {

  test("AvailableNow streaming run over events; re-run appends nothing") {
    val base = Files.createTempDirectory("graft-stream").toString
    val n1 = StreamDemo.run(spark, sfDir, s"$base/daily", s"$base/chk1")
    assert(n1 > 0, "first run must emit windows")
    // second run with a FRESH checkpoint replays the source from scratch —
    // only the idempotent sink prevents duplicates
    val n2 = StreamDemo.run(spark, sfDir, s"$base/daily", s"$base/chk2")
    assert(n2 == n1, s"idempotent sink must not grow: first=$n1 second=$n2")
  }
}
