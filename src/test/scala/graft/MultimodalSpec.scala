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

  // ── real codec (MediaCodec): exercised against real container bytes ──

  test("WAV roundtrip: encoder bytes parse back exactly, and the JDK's " +
      "own audio reader agrees on every stream parameter") {
    import graft.operators.MediaCodec
    // 200 frames of a deterministic 16-bit ramp, mono 8 kHz
    val data = Array.tabulate(400)(i => ((i * 37 + 11) % 256 - 128).toByte)
    val wav = MediaCodec.encodeWav(8000, 1, 16, data)
    val info = MediaCodec.parseWav(wav).get
    assert(info.sampleRate == 8000 && info.channels == 1 &&
      info.bitsPerSample == 16)
    assert(info.nFrames == 200 && info.durationMs == 25)
    assert(wav.slice(info.dataOffset, info.dataOffset + info.dataLen)
      .sameElements(data))
    // independent check: javax.sound.sampled reads the same container
    val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(wav))
    val fmt = ais.getFormat
    assert(fmt.getSampleRate == 8000f && fmt.getChannels == 1 &&
      fmt.getSampleSizeInBits == 16)
    assert(ais.getFrameLength == 200)
    // stereo 24-bit parses too (frame math generalizes)
    val st = MediaCodec.parseWav(
      MediaCodec.encodeWav(44100, 2, 24, new Array[Byte](44100 * 6))).get
    assert(st.nFrames == 44100 && st.durationMs == 1000)
  }

  test("strict WAV parser rejects text that merely starts with RIFF " +
      "and truncated/non-PCM containers") {
    import graft.operators.MediaCodec
    val textish = ("RIFFxxxxWAVE" + "the quick brown fox " * 4).getBytes
    assert(MediaCodec.parseWav(textish).isEmpty)
    val good = MediaCodec.encodeWav(8000, 1, 16, new Array[Byte](64))
    assert(MediaCodec.parseWav(good.take(40)).isEmpty) // truncated
    val nonPcm = good.clone(); nonPcm(20) = 3 // fmt code 3 = IEEE float
    assert(MediaCodec.parseWav(nonPcm).isEmpty)
    val overrun = good.clone(); overrun(40) = 127 // data size > payload
    assert(MediaCodec.parseWav(overrun).isEmpty)
    // a hostile chunk size near Int.MaxValue must fail the bounds
    // check, not wrap it into a crash
    val huge = good.clone()
    huge(16) = -16; huge(17) = -1; huge(18) = -1; huge(19) = 127
    assert(MediaCodec.parseWav(huge).isEmpty) // fmt size 0x7FFFFFF0
  }

  test("PNG roundtrip through ImageIO is pixel-exact; decode dispatch " +
      "sniffs containers and falls back to the stub shape") {
    import graft.operators.{MediaCodec, Multimodal}
    val px = (x: Int, y: Int) => (x * 13 + y * 31 + 7) % 256
    val png = MediaCodec.encodePng(20, 12, px)
    val img = MediaCodec.decodeImage(png).get
    assert(img.getWidth == 20 && img.getHeight == 12)
    for (y <- 0 until 12; x <- 0 until 20)
      assert((img.getRGB(x, y) & 0xff) == px(x, y), s"pixel ($x,$y)")
    assert(MediaCodec.pixelSum(img) ==
      (for (y <- 0 until 12; x <- 0 until 20) yield px(x, y).toLong).sum)
    // dispatch: image vs audio vs fallback-to-stub
    val di = MediaCodec.decode(1L, png)
    assert(di.mime == "image/png" && di.width == 20 && di.height == 12)
    val wav = MediaCodec.encodeWav(9000, 1, 16, new Array[Byte](90))
    val da = MediaCodec.decode(2L, wav)
    assert(da.mime == "audio/wav" && da.sample_rate == 9000 &&
      da.n_frames == 45 && da.duration_ms == 5)
    val txt = "plain old document text".getBytes
    val fb = MediaCodec.decode(3L, txt)
    val stub = Multimodal.decodeStub(3L, txt)
    assert(fb.mime == "application/octet-stream" &&
      fb.width == stub.width && fb.height == stub.height)
  }

  test("real resize bounds dimensions, never upscales, and its output " +
      "re-decodes as a valid PNG at those dimensions") {
    import graft.operators.MediaCodec
    val src = MediaCodec.encodePng(64, 48, (x, y) => (x + y) % 256)
    val (w, h, out) = MediaCodec.resizeImage(src, 16, 16).get
    assert(w == 16 && h == 12) // aspect preserved
    val back = MediaCodec.decodeImage(out).get
    assert(back.getWidth == 16 && back.getHeight == 12)
    // no upscale: an already-small image passes through at its own dims
    val (w2, h2, _) = MediaCodec.resizeImage(src, 256, 256).get
    assert(w2 == 64 && h2 == 48)
    assert(MediaCodec.resizeImage("not an image".getBytes, 16, 16).isEmpty)
  }

  test("decodeMedia stage runs the real dispatch partition-batched " +
      "over a mixed-modality corpus") {
    val sp = spark
    import sp.implicits._
    import graft.operators.{MediaCodec, Multimodal}
    val rows = Seq(
      (1L, MediaCodec.encodePng(10, 8, (x, y) => x + y)),
      (2L, MediaCodec.encodeWav(8000, 1, 16, Array.fill(100)(3: Byte))),
      (3L, "opaque text payload".getBytes))
    val media = rows.toDF("doc_id", "payload").repartition(2)
    val got = Multimodal.decodeMedia(media)
      .orderBy("doc_id").collect()
    assert(got.map(_.getString(1)).toSeq ==
      Seq("image/png", "audio/wav", "application/octet-stream"))
    assert(got(0).getInt(3) == 10 && got(0).getInt(4) == 8)
    assert(got(1).getInt(5) == 8000 && got(1).getLong(8) == 50L)
    assert(Multimodal.decodeMedia(media).rdd.getNumPartitions == 2)
  }

  test("mm_decode_wav / mm_decode_png queries: decoder output equals " +
      "the construction invariants (in-JVM replay at sf0.001)") {
    val wav = SparkEntry.queries("mm_decode_wav")(spark, Sf001).collect()
    val docs = Tables.documents(spark, Sf001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(wav.length == docs.size)
    wav.foreach { r =>
      val id = r.getLong(0)
      val n = docs(id).getBytes("UTF-8").length
      assert(r.getLong(5) == n / 2, s"doc $id frames")
      assert(r.getLong(6) == (n / 2) * 1000L / (8000 + (id % 8) * 1000))
    }
    val png = SparkEntry.queries("mm_decode_png")(spark, Sf001).collect()
    png.foreach { r =>
      val id = r.getLong(0)
      val (w, h) = (8 + (id % 24).toInt, 8 + ((id * 3) % 16).toInt)
      assert(r.getInt(2) == w && r.getInt(3) == h, s"doc $id dims")
      val want = (for (y <- 0 until h; x <- 0 until w)
        yield (id * 7 + x * 13L + y * 31L) % 256).sum
      assert(r.getLong(4) == want, s"doc $id pixel sum")
    }
  }
}
