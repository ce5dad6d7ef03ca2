package graft

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkSuite.Sf001
import graft.streaming.{DropDir, IdempotentSink, StreamDedup}
import org.apache.spark.sql.functions._

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

  test("kafka-shaped exactly-once ingest: redelivered records + a crash " +
      "mid-stream leave the sink with exactly one copy of every record") {
    // The at-least-once replay demo NOTES called for: a file drop-dir
    // plays the topic (maxFilesPerTrigger=1 → one micro-batch per
    // file), the producer REDELIVERS records across files and within a
    // file, StreamDedup collapses them inside the watermark horizon,
    // and IdempotentSink.transactional guards a plain APPEND sink (the
    // non-idempotent kind) against batch replay. The crash is the real
    // failure window: the checkpoint's commit record for the last
    // batch is deleted after the run — exactly the state a crash
    // between sink write and checkpoint commit leaves behind — so the
    // restart REPLAYS that batch with the same data and the marker
    // must absorb it.
    import spark.implicits._
    val in = Files.createTempDirectory("eo_in").toString
    val out = Files.createTempDirectory("eo_out").toString + "/data"
    val marker = Files.createTempDirectory("eo_marker").toString
    val ck = Files.createTempDirectory("eo_ck").toString
    val log = Paths.get(marker, "writes.log")
    val t0 = java.sql.Timestamp.valueOf("2024-03-01 12:00:00")

    def writeFile(name: String, ids: Seq[Int]): Unit =
      ids.map(i => (i.toLong, t0)).toDF("event_id", "ts").coalesce(1)
        .write.mode("overwrite").parquet(s"$in/$name")

    // at-least-once producer: in-file dups AND cross-file redeliveries
    writeFile("f1", (0 until 20) ++ (0 until 5))
    writeFile("f2", (20 until 40) ++ (10 until 20))

    def pipeline() = {
      val schema = spark.read.parquet(s"$in/f1").schema
      val raw = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(s"$in/f*")
      IdempotentSink.transactional(StreamDedup.dedup(raw), marker) {
        (batch, id) =>
          batch.write.mode("append").parquet(out) // NOT idempotent alone
          val line = s"$id:${spark.read.parquet(out).count()}\n"
          Files.writeString(log,
            (if (Files.exists(log)) Files.readString(log) else "") + line)
      }
    }

    IdempotentSink.drain(pipeline(), ck)
    assert(IdempotentSink.lastCommitted(marker) == 1L)
    assert(spark.read.parquet(out).select("event_id").distinct().count() == 40)

    // crash: the sink wrote and committed batch 1, but the checkpoint
    // commit was lost — Spark will re-offer batch 1 (same offsets,
    // same data) on restart
    Files.delete(Paths.get(ck, "commits", "1"))
    // the local ChecksumFileSystem shadows every file with a .crc twin;
    // a leftover twin makes the commit REWRITE fail FileAlreadyExists
    // (a real crash loses both — delete both)
    Files.deleteIfExists(Paths.get(ck, "commits", ".1.crc"))
    // meanwhile the producer ships more data, redelivering ids 0-9 yet
    // again (now from three batches ago — still inside the watermark)
    writeFile("f3", (40 until 50) ++ (0 until 10))

    IdempotentSink.drain(pipeline(), ck)
    val rows = spark.read.parquet(out)
    assert(rows.count() == 50, "a replayed batch or redelivered record " +
      s"duplicated the sink: ${rows.count()} rows for 50 distinct ids")
    assert(rows.groupBy("event_id").count()
      .filter(col("count") > 1).count() == 0)
    assert(rows.select("event_id").distinct().count() == 50)
    // the append sink fired once per batch id despite the replay
    assert(Files.readString(log) == "0:20\n1:40\n2:50\n")
    assert(IdempotentSink.lastCommitted(marker) == 2L)
  }

  test("stream_sessionize_feed ≡ batch session spans under the " +
      "emission contract (tails gated on timeout < final watermark)") {
    val got = SparkEntry.queries("stream_sessionize_feed")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    val spans = graft.operators.Inventory.sessionSpans(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val wmMs = Tables.events(spark, Sf001)
      .agg(max(unix_micros(col("ts")))).collect()(0).getLong(0) / 1000
    val lastSid = spans.groupBy(_._1).view.mapValues(_.map(_._2).max)
    val want = spans.filter { case (u, sid, _, end, _) =>
      sid < lastSid(u) || end / 1000 + 1800000 < wmMs
    }.map(s => (s._1, s._3, s._4, s._5)).sortBy(x => (x._1, x._2)).toSeq
    assert(got == want, "feed diverges from the gated batch spans")
    // the gate is provably non-vacuous: the user owning the max event
    // has a tail ending AT the watermark, whose close window cannot
    // have elapsed — at least one session must be withheld
    assert(spans.length - want.length >= 1,
      "no tail withheld — the timeout gate did nothing")
  }

  test("statefulShufflePartitions scales with source bytes: ceil-divide " +
      "by the 8 MB local target, floor 1, ceiling the hard cap") {
    import graft.streaming.Feeds
    assert(Feeds.statefulShufflePartitions(0L) == 1)
    assert(Feeds.statefulShufflePartitions(1L) == 1)
    assert(Feeds.statefulShufflePartitions(8L << 20) == 1)
    assert(Feeds.statefulShufflePartitions((8L << 20) + 1) == 2)
    assert(Feeds.statefulShufflePartitions(200L << 20) == 25)
    assert(Feeds.statefulShufflePartitions(Long.MaxValue / 2) == (1 << 15))
    // a negative (listing failed) never reaches the formula via drain,
    // but the formula itself still degrades to the floor
    assert(Feeds.statefulShufflePartitions(-5L) == 1)
  }

  test("statefulShufflePartitions parallelism floor (r15): available " +
      "cores engage only while each partition carries >= 512 KB") {
    import graft.streaming.Feeds
    // sf0.1-shaped source (2 MB) on 32 cores: the r14 formula collapsed
    // to 1 partition — the measured full-sweep regression; the floor
    // derives min(32, 2MB/512KB) = 4
    assert(Feeds.statefulShufflePartitions(2L << 20, 32) == 4)
    // tiny source: the floor stays inactive regardless of cores
    assert(Feeds.statefulShufflePartitions(200L << 10, 32) == 1)
    // large source: the floor caps at cores, the linear term and the
    // core alignment take over (200 MB -> max(25, 32) = 32)
    assert(Feeds.statefulShufflePartitions(200L << 20, 32) == 32)
    // single-core callers (the formula unit tests above) are unchanged
    assert(Feeds.statefulShufflePartitions(2L << 20) == 1)
  }

  test("drain's adaptive sizing reaches the state operator and the " +
      "session conf is restored afterwards") {
    import graft.streaming.Feeds
    val key = "spark.sql.shuffle.partitions"
    val prev = spark.conf.get(key)
    // pin the session high so the override is observable either way
    spark.conf.set(key, "17")
    try {
      val tmp = Files.createTempDirectory("adaptparts").toString
      Files.copy(Paths.get(s"$Sf001/events.parquet"),
        Paths.get(s"$tmp/events.parquet"),
        StandardCopyOption.REPLACE_EXISTING)
      val bytes = Feeds.sourceBytes(tmp, "events.parquet")
      assert(bytes > 0, "sourceBytes must see the staged file")
      val want = Feeds.statefulShufflePartitions(bytes)
      assert(want == 1, "sf0.001 events must derive the 1-partition floor")
      val schema = spark.read.parquet(s"$tmp/events.parquet").schema
      val agg = spark.readStream.schema(schema).parquet(tmp)
        .transform(Tables.normalizeTs)
        .groupBy("event_type").count()
      val q = Feeds.drain(spark,
        agg.writeStream.format("memory").outputMode("complete"),
        "adapt_parts_test", bytes)
      assert(spark.conf.get(key) == "17",
        "drain must restore the session's shuffle-partition setting")
      val sop = q.lastProgress.stateOperators
      assert(sop.length > 0, "stateful agg must report a state operator")
      assert(sop(0).numShufflePartitions == want.toLong,
        s"state operator ran at ${sop(0).numShufflePartitions} " +
          s"partitions, expected the derived $want")
      // and the sizing is honestly adaptive, not a constant: a source
      // past the 8 MB target derives more than one partition
      assert(Feeds.statefulShufflePartitions(bytes + (64L << 20)) > 1)
    } finally spark.conf.set(key, prev)
  }
}
