package graft

import java.nio.file.{Files, Paths}
import graft.streaming.IdempotentSink
import org.apache.spark.sql.functions._

/** Exactly-once sink semantics under replay: a re-delivered micro-batch
  * (fresh checkpoint, same input) must not duplicate output — the
  * parquet form overwrites its own batch partition, the transactional
  * form skips at-or-below the committed marker. */
class IdempotentSinkSpec extends SparkSuite {
  import spark.implicits._

  private def writeInput(dir: String, name: String, ids: Range): Unit =
    ids.map(_.toLong).toDF("id").coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/$name")

  private def stream(dir: String) = {
    val schema = spark.read.parquet(s"$dir/f1").schema
    spark.readStream.schema(schema).parquet(s"$dir/f*")
  }

  test("partitionedParquet: replayed batch overwrites, never duplicates") {
    val in = Files.createTempDirectory("sink_in").toString
    val out = Files.createTempDirectory("sink_out").toString + "/data"
    writeInput(in, "f1", 0 until 100)

    IdempotentSink.drain(
      IdempotentSink.partitionedParquet(stream(in), out),
      Files.createTempDirectory("ck1").toString)
    assert(spark.read.parquet(out).count() == 100)

    // crash-replay: FRESH checkpoint re-delivers the same data as the
    // same batch id — the partition overwrite absorbs it
    IdempotentSink.drain(
      IdempotentSink.partitionedParquet(stream(in), out),
      Files.createTempDirectory("ck2").toString)
    val after = spark.read.parquet(out)
    assert(after.count() == 100)
    assert(after.select("batch_id").distinct().count() == 1)
  }

  test("transactional: marker skips replayed batches, admits new ones") {
    val in = Files.createTempDirectory("sink_in2").toString
    val marker = Files.createTempDirectory("marker").toString
    val log = Paths.get(marker, "writes.log")
    writeInput(in, "f1", 0 until 50)
    def write(df: org.apache.spark.sql.DataFrame, id: Long): Unit = {
      val line = s"$id:${df.count()}\n"
      if (Files.exists(log)) Files.writeString(log,
        Files.readString(log) + line)
      else Files.writeString(log, line)
    }

    val ck1 = Files.createTempDirectory("ck3").toString
    IdempotentSink.drain(
      IdempotentSink.transactional(stream(in).toDF(), marker)(write), ck1)
    assert(Files.readString(log) == "0:50\n")
    assert(IdempotentSink.lastCommitted(marker) == 0L)

    // crash-replay with a fresh checkpoint: batch 0 re-delivered but the
    // committed marker absorbs it — the external write must NOT repeat
    IdempotentSink.drain(
      IdempotentSink.transactional(stream(in).toDF(), marker)(write),
      Files.createTempDirectory("ck4").toString)
    assert(Files.readString(log) == "0:50\n")

    // genuinely new data through the ORIGINAL checkpoint: batch 1 writes
    writeInput(in, "f2", 100 until 130)
    IdempotentSink.drain(
      IdempotentSink.transactional(stream(in).toDF(), marker)(write), ck1)
    assert(Files.readString(log) == "0:50\n1:30\n")
    assert(IdempotentSink.lastCommitted(marker) == 1L)
  }
}
