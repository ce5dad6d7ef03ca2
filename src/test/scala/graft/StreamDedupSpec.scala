package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamDedup

/** Cross-micro-batch dedup state: a second delivery containing already-
  * seen ids plus genuinely new ones must emit ONLY the new ones when the
  * stream resumes from its checkpoint. */
class StreamDedupSpec extends SparkSuite {
  import spark.implicits._

  private def writeBatch(dir: String, name: String, ids: Range): Unit =
    ids.map(i => (i.toLong, java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0).plusSeconds(i))))
      .toDF("event_id", "ts").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$name")

  // parquet sink: the memory sink can't recover from a checkpoint, and
  // checkpoint recovery is exactly what's under test
  private def drain(in: String, ck: String, out: String): Unit = {
    val schema = spark.read.parquet(s"$in/b1").schema
    val q = StreamDedup.dedup(
        spark.readStream.schema(schema).parquet(s"$in/b*"))
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("replayed ids are dropped, new ids pass, state survives restart") {
    val in = Files.createTempDirectory("dedup_in").toString
    val ck = Files.createTempDirectory("dedup_ck").toString
    val out = Files.createTempDirectory("dedup_out").toString + "/data"

    writeBatch(in, "b1", 0 until 100)
    drain(in, ck, out)
    assert(spark.read.parquet(out).count() == 100)

    // second delivery: 0..99 again (at-least-once replay) + 100..149 new
    writeBatch(in, "b2", 0 until 150)
    drain(in, ck, out)
    val ids = spark.read.parquet(out).select("event_id")
      .as[Long].collect().toSeq
    assert(ids.size == 150, s"expected 150 total rows, got ${ids.size}")
    assert(ids.distinct.size == 150, "replayed ids were emitted twice")
    assert(ids.toSet == (0L until 150L).toSet)
  }
}
