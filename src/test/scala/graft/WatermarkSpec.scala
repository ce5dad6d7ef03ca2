package graft

import java.nio.file.Files
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.functions._

/** Event-time watermark semantics: an event arriving in a later
  * micro-batch, with event time older than the committed watermark, is
  * dropped in append mode — the late-data handling a drop-dir pipeline
  * needs when files arrive out of order. The watermark survives between
  * runs in the checkpoint, exactly like a restarted production job. */
class WatermarkSpec extends SparkSuite {
  import spark.implicits._

  test("late file beyond the 1h watermark is dropped in append mode") {
    val dir = Files.createTempDirectory("late").toString
    val ckpt = Files.createTempDirectory("ckpt").toString
    def write(name: String, rows: Seq[(Long, java.sql.Timestamp, Double)]): Unit =
      rows.toDF("user_id", "ts", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$name")
    def t(s: String) = java.sql.Timestamp.valueOf(s)

    val outDir = Files.createTempDirectory("wmout").toString
    def runOnce(): Map[String, Double] = {
      val schema = spark.read.parquet(s"$dir/f1").schema
      val stream = spark.readStream.schema(schema).parquet(s"$dir/f*")
      val agg = stream
        .withWatermark("ts", "1 hour")
        .groupBy(window(col("ts"), "1 hour"))
        .agg(sum(col("value")).as("total"))
        .select(date_format(col("window.start"), "HH:mm").as("w"), col("total"))
      val q = agg.writeStream.format("parquet")
        .option("path", outDir)
        .option("checkpointLocation", ckpt)
        .outputMode("append").trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      spark.read.parquet(outDir).collect()
        .map(r => r.getString(0) -> r.getDouble(1)).toMap
    }

    // run 1: only f1 — events at 10:10 and 12:00 ⇒ watermark commits 11:00
    write("f1", Seq((1L, t("2024-01-01 10:10:00"), 1.0),
      (1L, t("2024-01-01 12:00:00"), 1.0)))
    val out1 = runOnce()
    // the 10:00 window closed (watermark 11:00) and was emitted
    assert(out1.get("10:00").contains(1.0), out1.toString)

    // run 2 (same checkpoint): f2 arrives with a LATE 02:30 event —
    // older than the committed 11:00 watermark — plus a live 12:30 one
    write("f2", Seq((1L, t("2024-01-01 02:30:00"), 99.0),
      (1L, t("2024-01-01 12:30:00"), 1.0)))
    val out2 = runOnce()
    // the late event must NOT resurrect a 02:00 window
    assert(!out2.contains("02:00"), out2.toString)
    assert(!out1.contains("02:00"))
  }
}
