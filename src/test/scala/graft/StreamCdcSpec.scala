package graft

import graft.SparkSuite.Sf001
import graft.streaming.StreamCdc
import org.apache.spark.sql.functions._

/** The streaming CDC feed must reproduce the batch cdc_apply snapshot
  * when its changelog is folded (latest version per key, deletes
  * dropped) — both sides apply the same (us, event_id, event_type,
  * value) version order, so the comparison is bit-exact on the raw
  * payloads. */
class StreamCdcSpec extends SparkSuite {

  private def fold(rows: Seq[(Long, String, String, Double, Long, Long)])
      : Map[Long, (String, String, Double, Long)] =
    rows.groupBy(_._1).map { case (uid, ch) =>
      val last = ch.maxBy(c => (c._5, c._6, c._3, c._4)) // (us, event_id, state, value)
      uid -> (last._2, last._3, last._4, last._5)
    }

  test("folded streaming changelog ≡ batch cdc_apply snapshot") {
    val streamed = StreamCdc.runAvailableNow(spark, Sf001, "cdc_equiv")
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("op"),
        r.getAs[String]("state"), r.getAs[Double]("value"),
        r.getAs[Long]("updated_us"), r.getAs[Long]("event_id")))
      .toSeq
    val snapshot = fold(streamed)
      .collect { case (uid, ("U", state, v, us)) => (uid, state, v, us) }
      .toSet

    val batch = SparkEntry.queries("cdc_apply")(spark, Sf001)
      .collect()
      .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("state"),
        r.getAs[Double]("val"), r.getAs[Long]("updated_us")))
      .toSet

    assert(batch.nonEmpty, "batch snapshot empty")
    assert(snapshot == batch,
      s"stream=${snapshot.size} batch=${batch.size} " +
        s"onlyStream=${(snapshot -- batch).take(3)} " +
        s"onlyBatch=${(batch -- snapshot).take(3)}")
    // the feed must contain real deletes or the delete path is untested
    assert(streamed.exists(_._2 == "D"), "no delete markers in the feed")
  }

  test("upsert / delete / re-insert across a checkpointed restart; " +
      "stale versions never regress a key") {
    val sp = spark
    import sp.implicits._
    val in = java.nio.file.Files.createTempDirectory("cdc_in").toString
    val ck = java.nio.file.Files.createTempDirectory("cdc_ck").toString
    val out = java.nio.file.Files.createTempDirectory("cdc_out").toString + "/c"

    def ts(day: Int, hour: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(2024, 1, day, hour, 0))
    def us(day: Int, hour: Int) = ts(day, hour).getTime * 1000L
    def write(name: String,
        rows: Seq[(Long, Long, java.sql.Timestamp, String, Double)]): Unit =
      rows.toDF("user_id", "event_id", "ts", "event_type", "value")
        .coalesce(1).write.mode("overwrite").parquet(s"$in/b/$name")

    def runOnce(): Seq[(Long, String, String, Double, Long, Long)] = {
      val stream = spark.readStream
        .schema("user_id LONG, event_id LONG, ts TIMESTAMP, " +
          "event_type STRING, value DOUBLE")
        .parquet(s"$in/b/*")
      val q = StreamCdc.changes(spark, stream)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      try spark.read.parquet(out).collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[String]("op"),
          r.getAs[String]("state"), r.getAs[Double]("value"),
          r.getAs[Long]("updated_us"), r.getAs[Long]("event_id")))
        .sortBy(t => (t._1, t._5, t._6)).toSeq
      catch {
        case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("Path does not exist") ||
               e.getMessage.contains("PATH_NOT_FOUND") ||
               e.getMessage.contains("UNABLE_TO_INFER_SCHEMA") => Nil
      }
    }

    // batch 1: user 1 upserts twice (one fold step → ONE emission with
    // the later version), user 2 upserts then deletes
    write("b1", Seq(
      (1L, 10L, ts(1, 9), "login", 1.0),
      (1L, 11L, ts(1, 10), "purchase", 2.0),
      (2L, 12L, ts(1, 9), "view", 3.0),
      (2L, 13L, ts(1, 11), "error", 0.0)))
    val r1 = runOnce()
    assert(r1 == Seq(
      (1L, "U", "purchase", 2.0, us(1, 10), 11L),
      (2L, "D", "error", 0.0, us(1, 11), 13L)), s"got $r1")

    // batch 2 after restart: user 2 re-inserts (D → U), user 1 receives
    // a STALE event (older us) — must not regress, must not emit;
    // nothing from batch 1 re-emits through the checkpoint
    write("b2", Seq(
      (2L, 14L, ts(1, 12), "signup", 4.0),
      (1L, 9L, ts(1, 8), "login", 9.9)))
    val r2 = runOnce()
    assert(r2 == Seq(
      (1L, "U", "purchase", 2.0, us(1, 10), 11L),
      (2L, "D", "error", 0.0, us(1, 11), 13L),
      (2L, "U", "signup", 4.0, us(1, 12), 14L)), s"got $r2")
  }
}
