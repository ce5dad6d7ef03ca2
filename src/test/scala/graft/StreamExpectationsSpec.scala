package graft

import graft.SparkSuite.Sf001
import graft.streaming.StreamExpectations
import org.apache.spark.sql.streaming.Trigger

/** The live expectation gate must equal the batch chk_expectations
  * matrix for its streamed (row-local) rules — same integer counters on
  * both sides — and accumulate across micro-batches with checkpoint
  * restart picking up where the counters left off. */
class StreamExpectationsSpec extends SparkSuite {

  private def matrix(df: org.apache.spark.sql.DataFrame)
      : Map[String, (Long, Boolean)] =
    df.collect().map(r =>
      r.getString(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap

  test("streamed gate ≡ batch chk_expectations on the streamed rules") {
    val streamed = matrix(
      StreamExpectations.runAvailableNow(spark, Sf001, "se_equiv"))
    assert(streamed.keySet == StreamExpectations.StreamedRules.toSet)
    val batch = matrix(SparkEntry.queries("chk_expectations")(spark, Sf001)
      .filter(org.apache.spark.sql.functions.col("rule")
        .isin(StreamExpectations.StreamedRules: _*)))
    assert(streamed == batch,
      s"stream=$streamed\nbatch=$batch")
  }

  test("counters accumulate across batches; restart resumes, not resets") {
    val sp = spark
    import sp.implicits._
    val in = java.nio.file.Files.createTempDirectory("se_in").toString
    val ck = java.nio.file.Files.createTempDirectory("se_ck").toString
    def ts(y: Int) = java.sql.Timestamp.valueOf(
      java.time.LocalDateTime.of(y, 6, 1, 0, 0))
    def write(name: String,
        rows: Seq[(String, Double, java.sql.Timestamp)]): Unit =
      rows.toDF("o_orderstatus", "o_totalprice", "o_orderdate").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/$name")
    def runOnce(qn: String): Map[String, (Long, Boolean)] = {
      val raw = spark.readStream
        .schema("o_orderstatus STRING, o_totalprice DOUBLE, o_orderdate TIMESTAMP")
        .parquet(s"$in/*")
      val q = StreamExpectations.gate(raw)
        .writeStream.format("memory").queryName(qn)
        .option("checkpointLocation", ck)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      matrix(spark.table(qn))
    }

    // batch 1: one clean row, one bad status, one non-positive total
    write("b1", Seq(("F", 10.0, ts(1996)), ("X", 10.0, ts(1996)),
      ("O", -5.0, ts(1996))))
    val m1 = runOnce("se_r1")
    assert(m1("orders.row_count_min") == ((3L, false)))
    assert(m1("orders.status_domain") == ((1L, false)))
    assert(m1("orders.totalprice_positive") == ((1L, false)))
    assert(m1("orders.orderdate_range") == ((0L, true)))

    // batch 2 (separate run, same checkpoint): an out-of-range date —
    // counters must RESUME from (3,1,1,0), not restart from zero
    write("b2", Seq(("P", 1.0, ts(1990))))
    val m2 = runOnce("se_r2")
    assert(m2("orders.row_count_min") == ((4L, false)))
    assert(m2("orders.status_domain") == ((1L, false)))
    assert(m2("orders.totalprice_positive") == ((1L, false)))
    assert(m2("orders.orderdate_range") == ((1L, false)))
  }
}
