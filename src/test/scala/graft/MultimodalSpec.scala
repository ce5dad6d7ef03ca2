package graft

import graft.SparkSuite.Sf001
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: binary payload schema, deterministic stub
  * decode, feature/metadata consistency. */
class MultimodalSpec extends SparkSuite {

  /** Planted-clone id offset (scale-derived since r11). */
  private lazy val off = operators.TextOps.cloneOff(spark, Sf001)

  test("media table: binary payload + typed metadata struct") {
    val m = Multimodal.mediaTable(spark, Sf001)
    val schema = m.schema
    assert(schema("payload").dataType.typeName == "binary")
    assert(schema("meta").dataType.typeName == "struct")
    assert(m.count() == 500)
  }

  test("decode stub is deterministic and byte-length-consistent") {
    val f1 = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, Sf001))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    val f2 = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, Sf001))
      .orderBy("doc_id").collect().map(_.toSeq).toSeq
    assert(f1 == f2)

    // byte_len equals n_chars (ascii corpus) — features tie back to meta
    val j = Multimodal.decodeFeatures(Multimodal.mediaTable(spark, Sf001))
      .join(Tables.documents(spark, Sf001), Seq("doc_id"))
      .filter(col("byte_len") =!= col("n_chars"))
    assert(j.count() == 0)
  }

  test("decode runs partition-batched (plan has no per-row shuffles)") {
    val df = Multimodal.decodeFeatures(
      Multimodal.mediaTable(spark, Sf001).repartition(4))
    assert(df.rdd.getNumPartitions == 4)
  }

  test("resize stub bounds dimensions and keeps batch shape") {
    val r = Multimodal.resizeStub(
      Multimodal.mediaTable(spark, Sf001), maxW = 128, maxH = 128)
    val rows = r.collect()
    assert(rows.length == 500)
    rows.foreach { x =>
      assert(x.getInt(1) <= 128 && x.getInt(2) <= 128)
      assert(x.getInt(1) >= 1 && x.getInt(2) >= 1)
    }
  }

  test("packShards: zero-byte payloads never open a shard; oversized " +
      "payloads get their own") {
    val sp = spark
    import sp.implicits._
    import graft.operators.Multimodal
    // sizes per doc: 0, 0, 3000 (> budget), 1000, 1500 — the zero-byte
    // docs must NOT trigger the overflow branch (an empty shard absorbs
    // even an oversized payload), then 1000+1500 overflows into shard 2
    val media = Seq(
      (1L, 0), (2L, 0), (3L, 3000), (4L, 1000), (5L, 1500)
    ).toDF("doc_id", "n")
      .select(col("doc_id"),
        expr("CAST(repeat('x', n) AS BINARY)").as("payload"),
        struct(lit("s").as("source")).as("meta"))
    val got = Multimodal.packShards(media, budget = 2048L)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(3), r.getLong(4))).toSeq
    assert(got == Seq(
      (1L, 0L, 0L), // zero bytes, shard 0 offset 0
      (2L, 0L, 0L), // still offset 0 (zero bytes added nothing)
      (3L, 0L, 0L), // oversized but shard 0 is EMPTY → stays, overfills
      (4L, 1L, 0L), // 3000 + 1000 > 2048 → shard closes
      (5L, 2L, 0L)  // 1000 + 1500 = 2500 > 2048 → closes again
    ), s"got $got")
  }

  test("mm_dedup_frames: planted clones caught at banded recall; " +
      "every pair passes the exact-Jaccard gate") {
    val pairs = SparkEntry.queries("mm_dedup_frames")(spark, Sf001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(pairs.nonEmpty)
    // the exact verify gate holds for every emitted pair, and jaccard
    // is consistent with the intersection/union counts it's derived from
    pairs.foreach { case (a, b, nInter, nA, nB, j) =>
      assert(a < b)
      assert(nInter <= math.min(nA, nB))
      assert(math.abs(j - nInter.toDouble / (nA + nB - nInter)) < 1e-12)
      assert(j >= 0.5 && j <= 1.0)
    }
    // planted clones (doc_id+off, 8 chars appended → last frame
    // perturbed): band recall is deterministic (md5) but < 1 by design
    // (~0.87 for J≈0.8 under 2×2 bands) — require the bulk caught, and
    // every caught clone strictly below J=1 (the appended tail really
    // does change the frame set)
    val clonePairs = pairs.filter { case (a, b, _, _, _, _) => b == a + off }
    val planted = Tables.documents(spark, Sf001)
      .filter(col("doc_id") % 10 === 0 && length(col("text")) > 0).count()
    assert(clonePairs.length >= (planted * 0.7).toInt,
      s"caught ${clonePairs.length} of $planted planted clones")
    assert(clonePairs.forall(_._6 < 1.0))
    // the corpus's own generator-planted near-dups surface too (pairs
    // NOT of the +off clone shape) — frame-set dedup is not just
    // finding our fixture
    assert(pairs.length > clonePairs.length)
  }

  test("frame-sample stub emits every-Nth deterministic frames") {
    val f1 = Multimodal.frameSampleStub(
      Multimodal.mediaTable(spark, Sf001), everyN = 3)
      .orderBy("doc_id", "frame_idx").collect()
    val f2 = Multimodal.frameSampleStub(
      Multimodal.mediaTable(spark, Sf001), everyN = 3)
      .orderBy("doc_id", "frame_idx").collect()
    assert(f1.nonEmpty)
    assert(f1.map(_.toSeq).toSeq == f2.map(_.toSeq).toSeq)
    assert(f1.forall(_.getInt(1) % 3 == 0))
  }

  test("mm_scene_cuts ≡ in-JVM shot-boundary replay; scenes tile each " +
      "payload's frame range contiguously") {
    val got = SparkEntry.queries("mm_scene_cuts")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    def md5hex(s: Array[Byte]) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, Sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._2.nonEmpty)
    val want = docs.flatMap { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val svs = bytes.grouped(32).map(g =>
        Integer.parseInt(md5hex(g).substring(0, 2), 16)).toVector
      var scene = 0L
      val scenes = svs.zipWithIndex.map { case (sv, i) =>
        if (i == 0 || math.abs(sv - svs(i - 1)) > 96) scene += 1
        (scene, i.toLong)
      }
      scenes.groupBy(_._1).toSeq.map { case (sc, fs) =>
        (id, sc, fs.map(_._2).min, fs.map(_._2).max, fs.length.toLong)
      }
    }
    assert(got.toSet == want.toSet, "scene ledger diverges from replay")
    // scenes tile: each doc's scenes are consecutive, disjoint, and
    // cover frames 0..max with no gap
    got.groupBy(_._1).foreach { case (id, rows) =>
      val s = rows.sortBy(_._2)
      assert(s.head._2 == 1L && s.head._3 == 0L, s"doc $id start")
      s.sliding(2).foreach {
        case Array(a, b) =>
          assert(b._2 == a._2 + 1 && b._3 == a._4 + 1, s"doc $id gap")
        case _ => ()
      }
      s.foreach { r => assert(r._5 == r._4 - r._3 + 1, s"doc $id len") }
    }
  }

  test("mm_silence_trim ≡ exact frame-energy replay; trims tile the " +
      "payload and both edge conventions hold") {
    def md5hex(b: Array[Byte]) =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"$x%02x").mkString
    val got = SparkEntry.queries("mm_silence_trim")(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))).toSeq
    val docs = Tables.documents(spark, SparkSuite.Sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).filter(_._2.nonEmpty)
      .sortBy(_._1)
    val want = docs.map { case (id, text) =>
      val svs = text.grouped(32).map(g =>
        Integer.parseInt(md5hex(g.getBytes("UTF-8")).substring(0, 2), 16))
        .toVector
      val loud = svs.zipWithIndex.filter(_._1 >= 64).map(_._2.toLong)
      val n = svs.length.toLong
      if (loud.isEmpty) (id, n, -1L, -1L, n, 0L, 0L)
      else (id, n, loud.min, loud.max, loud.min, n - 1 - loud.max,
        loud.max - loud.min + 1)
    }.toSeq
    assert(got == want, "silence-trim replay diverges")
    got.foreach { case (id, n, fl, ll, lead, tail, kept) =>
      // trims + kept span tile the payload exactly
      assert(lead + tail + kept == n, s"doc $id tiling")
      assert((fl == -1L) == (kept == 0L), s"doc $id empty convention")
    }
    // the fixture actually exercises both a nonzero lead and tail trim
    assert(got.exists(_._5 > 0) && got.exists(_._6 > 0),
      "no silent edges in fixture — vacuous")
  }

  test("mm_frame_tokens ≡ exact span replay; frames tile the payload " +
      "and token ranges are contiguous") {
    val got = SparkEntry.queries("mm_frame_tokens")(spark, SparkSuite.Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getInt(3), r.getInt(4))).toMap
    val docs = Tables.documents(spark, SparkSuite.Sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    var want = Map.empty[(Long, Long), (Long, Int, Int)]
    docs.foreach { case (id, text) =>
      val toks = text.split(" ").filter(_.nonEmpty)
      var off = 0L
      val hits = toks.zipWithIndex.flatMap { case (tok, idx) =>
        val fs = (off / 32) to ((off + tok.length - 1) / 32)
        off += tok.length + 1
        fs.map(f => (f, idx))
      }
      hits.groupBy(_._1).foreach { case (f, xs) =>
        want += (id, f) -> (xs.length.toLong, xs.map(_._2).min,
          xs.map(_._2).max)
      }
      // alignment tiles the payload: every 32-char frame of this doc
      // gets at least one token (single-spaced text has no dead frames)
      val nFrames = (text.length + 31) / 32
      (0L until nFrames.toLong).foreach { f =>
        assert(want.contains((id, f)), s"doc $id frame $f uncovered")
      }
    }
    assert(got == want, "frame-token alignment replay diverges")
    got.foreach { case ((id, f), (n, first, last)) =>
      assert(n == last - first + 1,
        s"doc $id frame $f: token range not contiguous")
    }
  }
}
