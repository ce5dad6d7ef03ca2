package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSuite.Sf001
import graft.streaming.DropDir

/** Drop-dir Structured Streaming pipeline ≡ its batch twin (SURVEY
  * §2.10): stage events.parquet into a temp drop dir, run
  * Trigger.AvailableNow, compare against the batch str_window_agg. */
class StreamingSpec extends SparkSuite {

  test("AvailableNow stream over a drop dir equals the batch window agg, " +
      "including files dropped in SUBDIRECTORIES") {
    // the file lands in a nested dir (the reference's getDDFiles
    // recursion intent, /root/reference/src/parse.ts:44-48) — the
    // stream must still see it via recursiveFileLookup
    val tmp = Files.createTempDirectory("dropdir").toString
    Files.createDirectories(Paths.get(s"$tmp/2024/01"))
    Files.copy(Paths.get(s"$Sf001/events.parquet"),
      Paths.get(s"$tmp/2024/01/events.parquet"),
      StandardCopyOption.REPLACE_EXISTING)

    val streamed = DropDir.runAvailableNow(spark, tmp, "dropdir_test")
      .orderBy("window_start", "event_type")
    val batch = SparkEntry.queries("str_window_agg")(spark, Sf001)

    val a = streamed.collect().map(_.toSeq).toSeq
    val b = batch.collect().map(_.toSeq).toSeq
    assert(a.nonEmpty)
    assert(a == b)
  }
}
