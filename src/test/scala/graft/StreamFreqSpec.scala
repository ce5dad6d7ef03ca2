package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import graft.functions.FreqSketch
import graft.streaming.StreamFreq

/** Streaming Misra-Gries state across micro-batches: after draining a
  * multi-delivery skewed stream, the freshest per-key snapshot must
  * honor the MG guarantee against exact whole-stream counts, and state
  * must survive a checkpoint restart. */
class StreamFreqSpec extends SparkSuite {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  /** Skewed item stream for one key: hot items over a churning tail. */
  private def mkItems(seed: Int, nTail: Int): Seq[(String, String)] = {
    val hot = Seq.fill(600)("hot_a") ++ Seq.fill(400)("hot_b")
    val tail = Seq.fill(nTail)(s"cold_${seed}_${rnd.nextInt(2000)}")
    rnd.shuffle(hot ++ tail).map(("k1", _))
  }

  private def drain(in: String, ck: String, out: String): Unit = {
    val schema = spark.read.parquet(s"$in/b1").schema
    val q = StreamFreq.heavyHitters(spark,
        spark.readStream.schema(schema).parquet(s"$in/b*")
          .as[StreamFreq.Item])
      .writeStream.format("parquet")
      .option("path", out)
      .option("checkpointLocation", ck)
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
  }

  test("sketch state folds across batches and a checkpoint restart") {
    val in = Files.createTempDirectory("freq_in").toString
    val ck = Files.createTempDirectory("freq_ck").toString
    val out = Files.createTempDirectory("freq_out").toString + "/data"

    val b1 = mkItems(1, 3000)
    val b2 = mkItems(2, 3000)
    b1.toDF("key", "item").coalesce(1).write.parquet(s"$in/b1")
    drain(in, ck, out)
    // second delivery AFTER the first drain finished: the resumed query
    // must fold onto the checkpointed sketch, not restart from zero
    b2.toDF("key", "item").coalesce(1).write.parquet(s"$in/b2")
    drain(in, ck, out)

    val all = b1 ++ b2
    val exact = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val n = all.size.toLong
    val bar = n / (FreqSketch.K + 1)

    val rows = spark.read.parquet(out)
      .collect().map(r => (r.getString(0), r.getString(1),
        r.getLong(2), r.getLong(3)))
    // freshest snapshot = rows carrying the max n cursor for the key;
    // its n must equal the full stream length (state survived restart)
    val maxN = rows.map(_._4).max
    assert(maxN == n, s"final cursor $maxN != stream length $n — state lost")
    val snapshot = rows.filter(_._4 == maxN).map(r => r._2 -> r._3).toMap
    assert(snapshot.size <= FreqSketch.K)
    // MG guarantee vs the exact whole-stream counts
    exact.foreach { case (item, f) =>
      if (f > bar) assert(snapshot.contains(item),
        s"item $item freq $f > bar $bar missing from final sketch")
    }
    snapshot.foreach { case (item, est) =>
      val f = exact.getOrElse(item, 0L)
      assert(est <= f && est >= f - bar,
        s"$item: est $est outside [${f - bar}, $f]")
    }
    // the hot items are unambiguously present with dominant estimates
    assert(snapshot("hot_a") > snapshot("hot_b"))
  }
}
