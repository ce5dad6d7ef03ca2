package graft

import graft.SparkSuite.Sf001
import graft.operators.Vectors
import org.apache.spark.sql.functions._

/** Similarity-search properties: LSH bucketing finds planted duplicates,
  * bucket candidate sets are genuinely smaller than the corpus, and
  * brute-force top-k is sane. */
class VectorsSpec extends SparkSuite {

  test("identical vectors land in the same LSH bucket (planted dups)") {
    val e = Tables.embeddings(spark, Sf001)
    val b = e.withColumn("bucket", Vectors.lshBucket(col("embedding")))
    val clones = e.withColumn("vec_id", col("vec_id") + 10000)
      .withColumn("bucket", Vectors.lshBucket(col("embedding")))
    // exact payload copy ⇒ identical projections ⇒ identical bucket
    val joined = b.select(col("vec_id"), col("bucket").as("b1"))
      .join(clones.select((col("vec_id") - 10000).as("vec_id"),
        col("bucket").as("b2")), Seq("vec_id"))
    assert(joined.filter(col("b1") =!= col("b2")).count() == 0)
  }

  test("LSH buckets partition the corpus into many non-trivial cells") {
    val b = Tables.embeddings(spark, Sf001)
      .withColumn("bucket", Vectors.lshBucket(col("embedding")))
    val sizes = b.groupBy("bucket").count()
    val nBuckets = sizes.count()
    val maxCell = sizes.agg(max("count")).head.getLong(0)
    assert(nBuckets > 32, s"only $nBuckets buckets")
    assert(maxCell < 500 / 4, s"largest bucket $maxCell — not partitioning")
  }

  test("brute-force top-k: self excluded, cos in [-1,1], k respected") {
    val topk = SparkEntry.queries("sim_topk_bruteforce")(spark, Sf001)
    val rows = topk.collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getLong(2) != r.getLong(0)))  // vec_id != q_id
    assert(rows.forall(r => math.abs(r.getDouble(3)) <= 1.0 + 1e-12))
    val perQ = rows.groupBy(_.getLong(0)).view.mapValues(_.length)
    assert(perQ.values.forall(_ <= 10))
  }

  test("LSH top-k results are a subset of brute-force candidates' scores") {
    // every LSH hit must carry the same cosine the brute-force path
    // computes — i.e. LSH only prunes, never alters scores
    val lsh = SparkEntry.queries("sim_lsh_bucketed")(spark, Sf001)
      .select("q_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val bf = SparkEntry.queries("sim_topk_bruteforce")(spark, Sf001)
      .select("q_id", "vec_id", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val common = lsh.keySet intersect bf.keySet
    assert(common.forall(k => lsh(k) == bf(k)))
  }

  test("groupCentroids: distributed per-group mean, dims in order") {
    import spark.implicits._
    val df = Seq(
      ("a", Array(1.0f, 2.0f, 3.0f)),
      ("a", Array(3.0f, 4.0f, 5.0f)),
      ("b", Array(10.0f, 0.0f, -2.0f)))
      .toDF("grp", "embedding")
    val got = Vectors.groupCentroids(df, "grp").collect()
      .map(r => r.getString(0) -> r.getSeq[Double](1)).toMap
    assert(got("a") == Seq(2.0, 3.0, 4.0))
    assert(got("b") == Seq(10.0, 0.0, -2.0))
    // real table: one 64-dim centroid per bucket, no driver-side loop
    val e = Tables.embeddings(spark, Sf001)
      .withColumn("grp", col("vec_id") % 4)
    val c = Vectors.groupCentroids(e, "grp").collect()
    assert(c.length == 4 && c.forall(_.getSeq[Double](1).length == Vectors.Dim))
  }

  test("IVF ANN: deterministic, k respected, planted route sane") {
    val a = SparkEntry.queries("sim_ivf_bucketed")(spark, Sf001).collect()
    val b = SparkEntry.queries("sim_ivf_bucketed")(spark, Sf001).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toSeq).toSeq == b.map(_.toSeq).toSeq) // fixed-seed determinism
    val perQ = a.groupBy(_.getLong(0))
    assert(perQ.values.forall(_.length <= 10))
    // IVF scores must match brute-force scores on common pairs
    val bf = SparkEntry.queries("sim_topk_bruteforce")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(2)) -> r.getDouble(3)).toMap
    a.foreach { r =>
      val k = (r.getLong(0), r.getLong(2))
      bf.get(k).foreach(c => assert(c == r.getDouble(3)))
    }
  }

  test("dedup_semantic: clusters stay in-cell, min-id survivor, covers corpus") {
    val rows = SparkEntry.queries("dedup_semantic")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getBoolean(3)))
    assert(rows.nonEmpty)
    assert(rows.map(_._1).distinct.length == rows.length, "one row per vector")
    val byCluster = rows.groupBy(_._3)
    byCluster.foreach { case (cl, members) =>
      // edges never cross cells, so a cluster's members share one cell
      assert(members.map(_._2).distinct.length == 1,
        s"cluster $cl spans cells ${members.map(_._2).distinct.mkString(",")}")
      // survivor = min vec_id, exactly one kept
      assert(members.map(_._1).min == cl)
      assert(members.count(_._4) == 1 && members.find(_._4).get._1 == cl)
    }
    // the threshold actually removes something in the fixture corpus
    assert(rows.exists(!_._4), "no semantic near-dups found — dead threshold")
  }

  test("PQ codes are non-degenerate and ADC is a sane ranking") {
    // every subspace position must actually discriminate (≥2 codewords
    // in use) — a constant code column means the codebook scale is off
    val codes = SparkEntry.queries("vec_pq_codes")(spark, Sf001)
      .collect().map(_.getString(1).split(",").map(_.toInt))
    assert(codes.length == 500)
    for (m <- 0 until 8)
      assert(codes.map(_(m)).distinct.length >= 2, s"subspace $m degenerate")
    // ADC: per query exactly 10 ranked rows, non-negative, non-decreasing
    val adc = SparkEntry.queries("sim_pq_adc")(spark, Sf001).collect()
    val perQ = adc.groupBy(_.getLong(0))
    assert(perQ.size == 5 && perQ.values.forall(_.length == 10))
    perQ.values.foreach { rows =>
      val ds = rows.sortBy(_.getInt(1)).map(_.getDouble(3))
      assert(ds.forall(_ >= 0.0))
      assert(ds.sliding(2).forall(p => p(0) <= p(1)), "ADC not sorted")
    }
  }

  test("vec_drift ≡ in-JVM milli-quantized epoch sums, every row") {
    val got = SparkEntry.queries("vec_drift")(spark, Sf001).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> (r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getInt(7))).toMap
    assert(got.size == 10 * Vectors.Dim)
    val raw = Tables.embeddings(spark, Sf001)
      .select("vec_id", "label", "embedding").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getSeq[Float](2)))
    val want = raw.flatMap { case (id, lbl, emb) =>
      emb.zipWithIndex.map { case (x, p) =>
        ((lbl, p + 1), id % 2 == 0, math.floor(x.toDouble * 1000).toLong)
      }
    }.groupBy(_._1).map { case (k, rows) =>
      val (a, b) = rows.partition(_._2)
      val (na, nb) = (a.length.toLong, b.length.toLong)
      val (sa, sb) = (a.map(_._3).sum, b.map(_._3).sum)
      val diff = sa * nb - sb * na
      k -> (na, nb, sa, sb, math.abs(diff) / (na * nb),
        java.lang.Long.signum(diff))
    }
    assert(got == want)
    // the parity split must be a real split everywhere
    assert(got.values.forall(v => v._1 > 0 && v._2 > 0))
  }

  test("sim_ivf_recall: bounded, and probing EVERY list recovers the " +
      "brute-force baseline exactly") {
    val rec = SparkEntry.queries("sim_ivf_recall")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rec.length == 5)
    rec.foreach { case (_, hits, recall) =>
      assert(hits >= 0 && hits <= 10 && recall == hits / 10.0)
    }
    // partial probe must lose SOMETHING on this corpus (otherwise the
    // recall query measures nothing)
    assert(rec.exists(_._2 < 10))
    // nprobe = nlist ⇒ candidate set = full corpus ⇒ IVF ≡ brute force
    val full = Vectors.ivfFixedTopK(spark, Sf001, 10,
        Vectors.FixedNList, Vectors.FixedNList)
      .select("q_id", "rn", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    val brute = Vectors.bruteTopK(spark, Sf001, 10)
      .select("q_id", "rn", "vec_id").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getLong(2))).toSet
    assert(full == brute)
  }

  test("vec_decontaminate: exactly the planted eval clones flag; the " +
      "natural corpus stays clear of the gate") {
    val rows = SparkEntry.queries("vec_decontaminate")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    val flagged = rows.filter(_._3).map(_._1).sorted.toSeq
    assert(flagged == (10000L to 10004L),
      s"flagged ${flagged.mkString(",")}")
    // planted clones are exact copies ⇒ cosine ≈ 1
    rows.filter(_._3).foreach { case (_, mc, _) =>
      assert(math.abs(mc - 1.0) < 1e-9) }
    // the natural corpus sits far from the gate (max ≈ 0.40), so the
    // 0.9 threshold separates cleanly rather than knife-edging
    assert(rows.filterNot(_._3).forall(_._2 < 0.5))
  }

  test("sim_hybrid_rrf: fused top-5 draws from BOTH retrieval lists " +
      "and scores are the exact two-term RRF") {
    val fused = SparkEntry.queries("sim_hybrid_rrf")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2),
        r.getDouble(3)))
    assert(fused.length == 25) // 5 queries × top-5
    val dense = Vectors.bruteTopK(spark, Sf001, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    fused.groupBy(_._1).foreach { case (qid, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1 to 5).toSeq)
      // equal per-rank scores force the lists to interleave, so the
      // fused head must contain members of the dense list (and, unless
      // the lists coincide, of the sparse one — every fused score is a
      // one- or two-term RRF sum, so any non-dense doc IS sparse)
      assert(rs.exists(r => dense.contains((qid, r._3))),
        s"query $qid fused list ignores the dense list")
      // every rrf score is attainable from ranks ≤ 10: it must equal
      // 1/(60+a) + [0 or 1/(60+b)] for some a, b in 1..10
      val legal = (for (a <- 1 to 10; b <- 0 to 10) yield
        1.0 / (60 + a) + (if (b == 0) 0.0 else 1.0 / (60 + b))).toSet
      rs.foreach { case (_, _, _, score) =>
        assert(legal.exists(l => math.abs(l - score) < 1e-12),
          s"score $score is not a two-term RRF sum") }
    }
  }

  test("sim_ivf_recall_curve: monotone in nprobe, exact hit identities, " +
      "closes at recall 1 when nprobe = nlist") {
    val curve = SparkEntry.queries("sim_ivf_recall_curve")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    // denominator derived from the brute-force baseline the query
    // itself normalizes by — never a literal the query could drift
    // from in lockstep (ADVICE r7)
    val nBf = SparkEntry.queries("sim_topk_bruteforce")(spark, Sf001).count()
    assert(nBf > 0, "empty brute-force baseline - fixture degenerate")
    assert(curve.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L))
    curve.foreach { case (p, hits, recall) =>
      assert(hits >= 0 && hits <= nBf, s"nprobe $p hits $hits")
      assert(recall == hits.toDouble / nBf, s"nprobe $p recall identity")
    }
    // widening the probe can only ADD candidates -> recall monotone
    curve.sliding(2).foreach { case Array((p1, h1, _), (p2, h2, _)) =>
      assert(h1 <= h2, s"recall fell from nprobe $p1 to $p2") }
    // nprobe = nlist probes every list = brute force
    assert(curve.last._3 == 1.0, "full probe did not recover brute force")
    // the curve must actually climb on this corpus
    assert(curve.head._2 < curve.last._2, "flat curve - fixture degenerate")
  }

  test("chk_label_balance ≡ exact per-class ledger; shares and flags " +
      "internally consistent") {
    val got = SparkEntry.queries("chk_label_balance")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3), r.getBoolean(4)))
    val want = Tables.embeddings(spark, Sf001)
      .select("label").collect().map(_.getInt(0).toLong)
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val t = want.values.sum; val mx = want.values.max
    assert(got.map(g => g._1 -> g._2).toMap == want)
    got.foreach { case (l, n, ppm, ratio, minority) =>
      assert(ppm == n * 1000000L / t, s"label $l ppm")
      assert(ratio == n.toDouble / mx, s"label $l ratio")
      assert(minority == (n * 2 < mx), s"label $l flag")
    }
    assert(got.exists(_._4 == 1.0), "no majority class at ratio 1")
  }

  test("vec_binary_sign ≡ in-JVM sign-pack replay; sim_binary_hamming " +
      "is the exact Hamming top-5 over those signatures") {
    val sig = SparkEntry.queries("vec_binary_sign")(spark, Sf001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val embs = Tables.embeddings(spark, Sf001)
      .select("vec_id", "embedding").collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    assert(sig.size == embs.size)
    embs.foreach { case (id, e) =>
      var lo = 0L; var hi = 0L; var np = 0L
      e.zipWithIndex.foreach { case (x, p) =>
        if (x > 0) {
          np += 1
          if (p < 32) lo |= 1L << p else hi |= 1L << (p - 32)
        }
      }
      val (gLo, gHi, gNp) = sig(id)
      assert((gLo, gHi, gNp) == ((lo, hi, np)), s"vec $id signature")
      // n_pos IS the signature popcount — the packing is lossless
      assert(java.lang.Long.bitCount(gLo) + java.lang.Long.bitCount(gHi)
        == gNp, s"vec $id popcount")
    }
    val topk = SparkEntry.queries("sim_binary_hamming")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val want = sig.keys.filter(_ < 5).toSeq.sorted.flatMap { q =>
      val (ql, qh, _) = sig(q)
      (sig - q).toSeq.map { case (n, (nl, nh, _)) =>
        (n, (java.lang.Long.bitCount(ql ^ nl)
          + java.lang.Long.bitCount(qh ^ nh)).toLong)
      }.sortBy(identity).sortBy(_._2).take(5).zipWithIndex
        .map { case ((n, hd), i) => (q, (i + 1).toLong, n, hd) }
    }
    assert(topk.map(t => (t._1, t._2, t._3, t._4)).toSeq == want,
      "Hamming top-5 diverges from replay")
    topk.foreach { case (q, _, n, hd, cos) =>
      assert(hd >= 0 && hd <= 64 && n != q)
      assert(cos >= -1.0 - 1e-12 && cos <= 1.0 + 1e-12, s"($q,$n) $cos")
    }
  }

  test("IVF sample-fit quantizer: fixed-seed KMeans centroid fingerprint " +
      "is pinned (ivfTopK's library API keeps a deterministic anchor)") {
    // ivfTopK's sample-fit ML KMeans is not SQL-expressible; since r11
    // the REGISTERED sim_ivf_bucketed uses the data-fit md5-lottery +
    // integer-Lloyd quantizer and is DuckDB-oracled, while ivfTopK
    // stays available as library API. Its determinism was
    // previously same-session only (two runs, one JVM); this pins the
    // FIT itself across sessions: a fixture-independent LCG corpus,
    // explicit hash partitioning (sample() is per-partition, so layout
    // is part of the contract), fixed sample/fit seeds — the centroid
    // set's order-canonicalized 6-sig-digit fingerprint must equal the
    // recorded constant. Drift means the quantizer contract changed
    // (Spark upgrade, parameter edit) and the rows-only entry's
    // documented determinism claim needs re-validation.
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    import spark.implicits._
    def lcg(x: Long): Long = x * 6364136223846793005L + 1442695040888963407L
    val rows = (0 until 256).map { i =>
      var st = lcg(i.toLong + 99L)
      val v = Array.fill(8) {
        st = lcg(st); (st >>> 40).toDouble / (1L << 24).toDouble
      }
      (i.toLong, v)
    }
    val df = rows.toDF("vec_id", "embedding")
      .repartition(4, col("vec_id"))
      .withColumn("v", array_to_vector(col("embedding")))
    val km = new KMeans().setK(8).setSeed(42L).setFeaturesCol("v")
      .setMaxIter(5)
    val model = km.fit(df.sample(withReplacement = false, 0.5, 7L))
    val canon = model.clusterCenters
      .map(_.toArray.map(x => f"$x%.6e").mkString(","))
      .sorted.mkString(";")
    val fp = java.security.MessageDigest.getInstance("MD5")
      .digest(canon.getBytes("UTF-8")).map("%02x".format(_)).mkString
    assert(fp == "cf99ea28a9f8c7c62232e9dca23b5399",
      s"quantizer fingerprint drifted: $fp\ncentroids: $canon")
  }

  test("sim_range_search: sound vs brute force (no false results), " +
      "banded recall clears the sign-LSH floor") {
    val got = SparkEntry.queries("sim_range_search")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.nonEmpty)
    // brute-force truth: every pair with cos >= 0.4
    val e = Tables.embeddings(spark, Sf001)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var i = 0; var ab = 0.0; var aa = 0.0; var bb = 0.0
      while (i < a.length) {
        ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1
      }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val ids = e.keys.toSeq.sorted
    val truth = (for {
      i <- ids.indices; j <- (i + 1) until ids.length
      if cos(e(ids(i)), e(ids(j))) >= 0.4 - 1e-12
    } yield (ids(i), ids(j))).toSet
    assert(got.subsetOf(truth),
      s"false results: ${(got -- truth).take(3)}")
    // 2 bands x 4 planes at tau=0.4 measured 22/59 on this fixture;
    // pin a conservative floor so a banding regression fails loudly
    assert(got.size.toDouble / truth.size >= 0.25,
      s"recall ${got.size}/${truth.size} under the banded floor")
  }

  test("vec_pq_distortion ≡ exact per-row replay off the literal codebook") {
    val rows = SparkEntry.queries("vec_pq_distortion")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2)))
    assert(rows.length == Tables.embeddings(spark, Sf001).count())
    val e = Tables.embeddings(spark, Sf001)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    rows.foreach { case (id, dist, rel) =>
      val x = e(id)
      val want = (0 until Vectors.PqM).map { m =>
        (0 until Vectors.PqK).map { k =>
          var s = 0.0
          (0 until Vectors.PqSub).foreach { j =>
            val dd = x(m * Vectors.PqSub + j) - Vectors.pqCb(m, k, j)
            s += dd * dd
          }
          s
        }.min
      }.reduceLeft(_ + _)
      assert(dist == want, s"vec $id distortion")
      var n2 = 0.0; x.foreach(v => n2 += v * v)
      // the query divides by nrm*nrm (sqrt then square — one rounding
      // step each), not by the raw Σx²: replay the identical route
      val nrm = math.sqrt(n2)
      assert(rel == want / (nrm * nrm), s"vec $id rel_distortion")
      assert(dist >= 0.0 && rel >= 0.0)
    }
  }

  test("vec_cosine_calibration ≡ exact md5-ring replay; pair count " +
      "conserves n-1") {
    val got = SparkEntry.queries("vec_cosine_calibration")(spark, Sf001)
      .collect().map(r => (r.getInt(0), r.getDouble(1), r.getLong(2)))
    val e = Tables.embeddings(spark, Sf001)
      .collect().map(r => r.getLong(0) ->
        r.getSeq[Float](1).map(_.toDouble).toArray).toMap
    assert(got.map(_._3).sum == e.size - 1L)
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val ring = e.keys.toSeq.sortBy(id => (md5hex(id.toString), id))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var ab = 0.0; var aa = 0.0; var bb = 0.0; var i = 0
      while (i < a.length) {
        ab += a(i) * b(i); aa += a(i) * a(i); bb += b(i) * b(i); i += 1 }
      ab / (math.sqrt(aa) * math.sqrt(bb))
    }
    val want = ring.sliding(2).map { case Seq(x, y) =>
      math.floor((cos(e(x), e(y)) + 1.0) * 10).toInt
    }.toSeq.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got.map(r => r._1 -> r._3).toMap == want, "histogram diverges")
    got.foreach { case (bin, lo, _) =>
      assert(bin >= 0 && bin <= 20 && lo == bin.toDouble / 10 - 1.0) }
  }

  test("vec_mrl_energy: monotone in k, exact at k=64, per-row ppm " +
      "replays bit-for-bit") {
    val rows = SparkEntry.queries("vec_mrl_energy")(spark, Sf001)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(rows.keySet == Set(8, 16, 32, 64))
    val n = Tables.embeddings(spark, Sf001).count()
    rows.values.foreach { case (gn, _, _) => assert(gn == n) }
    // monotone: a longer prefix retains at least as much energy
    assert(rows(8)._3 <= rows(16)._3 && rows(16)._3 <= rows(32)._3 &&
      rows(32)._3 <= rows(64)._3)
    // k = 64 is the whole vector: every ppm is exactly 10^6
    assert(rows(64)._2 == n * 1000000L && rows(64)._3 == 1.0)
    // exact replay of the ppm sum at k = 16
    val e = Tables.embeddings(spark, Sf001)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    val want16 = e.map { x =>
      var p = 0.0; (0 until 16).foreach(i => p += x(i) * x(i))
      var f = 0.0; x.foreach(v => f += v * v)
      math.floor(p / f * 1000000).toLong
    }.sum
    assert(rows(16)._2 == want16, "k=16 ppm sum diverges")
  }

  test("sim_ivf_balance: occupancy conserves the corpus, load factors " +
      "average exactly 1, grid surfaces every list") {
    val rows = SparkEntry.queries("sim_ivf_balance")(spark, Sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
    assert(rows.length == Vectors.FixedNList)
    assert(rows.map(_._2).sum == Tables.embeddings(spark, Sf001).count())
    val mean = rows.map(_._3).sum / rows.length
    assert(math.abs(mean - 1.0) < 1e-9, s"mean load factor $mean")
    rows.foreach { case (l, n, f) =>
      assert(n >= 0 && f >= 0.0, s"list $l") }
  }

  test("vec_dim_variance ≡ exact milli-quantized replay; 64 dims, " +
      "nonnegative variance") {
    val got = SparkEntry.queries("vec_dim_variance")(spark, Sf001)
      .collect().map(r => r.getInt(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.size == Vectors.Dim)
    val e = Tables.embeddings(spark, Sf001)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    (1 to Vectors.Dim).foreach { dim =>
      val ms = e.map(x => math.floor(x(dim - 1) * 1000).toLong)
      val n = ms.length.toLong
      val s1 = ms.sum; val s2 = ms.map(m => m * m).sum
      val (gn, mean, variance) = got(dim)
      assert(gn == n)
      assert(mean == s1.toDouble / n / 1000)
      assert(variance ==
        (n * s2 - s1 * s1).toDouble / (n.toDouble * (n.toDouble - 1.0))
          / 1000000)
      assert(variance >= 0.0)
    }
  }

  test("vec_kmeans_step: member counts conserve the corpus ×64, means " +
      "are the exact floor-divided sums, and the step actually moves") {
    val got = SparkEntry.queries("vec_kmeans_step")(spark, Sf001)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(got.nonEmpty)
    val total = Tables.embeddings(spark, Sf001).count()
    // every (list, dim) row carries the list's member count: summing n
    // over one fixed dim recovers the corpus
    val perDim = got.toSeq.groupBy(_._1._2).view.mapValues(_.map(_._2._1).sum)
    perDim.foreach { case (dim, s) => assert(s == total, s"dim $dim") }
    got.foreach { case ((l, dim), (n, sumQ, meanQ, shiftQ)) =>
      assert(meanQ == math.floor(sumQ.toDouble / n).toLong, s"($l,$dim)")
      val old = (Vectors.fixedCentroid(l, dim) * 1000).toLong
      assert(shiftQ == meanQ - old, s"($l,$dim) shift")
      assert(meanQ.abs <= 1024000, s"($l,$dim) mean out of range")
    }
    // a real Lloyd step moves the seed: at least one component shifts
    assert(got.values.exists(_._4 != 0L), "step is a no-op — vacuous")
  }

  test("sim_ivf_ndcg: zero exactly when recall is zero, " +
      "exact at nprobe = nlist, constant idcg") {
    val nd = SparkEntry.queries("sim_ivf_ndcg")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(nd.length == 5)
    nd.foreach { case (q, dcg, idcg, ppm) =>
      assert(idcg == 55991L, s"q$q idcg")
      assert(dcg >= 0 && dcg <= idcg, s"q$q dcg bounds")
      assert(ppm == math.floor(dcg * 1000000.0 / idcg).toLong, s"q$q ppm")
    }
    // NDCG and recall must agree on EMPTINESS (a hit anywhere gains
    // something; no hits gain nothing) — but neither bounds the other:
    // gains are top-weighted, so one rank-1 hit beats five tail hits
    val rec = SparkEntry.queries("sim_ivf_recall")(spark, Sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    nd.foreach { case (q, dcg, _, _) =>
      assert((dcg > 0) == (rec(q) > 0), s"q$q ndcg/recall emptiness")
    }
    // perfect-probe replay: widening the probe to every list makes the
    // IVF ranking ≡ brute force, so NDCG closes at exactly 1
    val full = Vectors.ivfFixedTopK(spark, Sf001, 10,
        Vectors.FixedNList, Vectors.FixedNList)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    val bf = Vectors.bruteTopK(spark, Sf001, 10)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(full.toSeq == bf.toSeq, "nprobe=nlist must equal brute force")
  }

  test("pipeline_index: stage ledger laws — planted clones all die in " +
      "dedup, survivors are the original corpus, recall reconciles " +
      "with sim_ivf_recall exactly") {
    val st = SparkEntry.queries("pipeline_index")(spark, Sf001)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2)))
      .toMap
    val n = Tables.embeddings(spark, Sf001).count()
    val clones = Tables.embeddings(spark, Sf001)
      .filter(col("vec_id") % 5 === 0).count()
    assert(st("1_ingest") == (n + clones, n),
      "ingest must count the clone-planted corpus and its true classes")
    assert(st("2_dedup") == (n, clones),
      "dedup must remove exactly the planted clones")
    assert(st("3_assign")._1 == n && st("3_assign")._2 <= Vectors.FixedNList)
    assert(st("4_balance")._2 >= (n + Vectors.FixedNList - 1)
      / Vectors.FixedNList, "max occupancy below the pigeonhole floor")
    // survivors ≡ the original corpus (clones had strictly larger ids),
    // so the pipeline's probe search IS sim_ivf_recall's — hit counts
    // must reconcile exactly
    val recallHits = SparkEntry.queries("sim_ivf_recall")(spark, Sf001)
      .collect().map(_.getLong(1)).sum
    assert(st("5_recall") == (50L, recallHits),
      s"pipeline recall ${st("5_recall")} vs sim_ivf_recall $recallHits")
  }

  test("vec_power_iter ≡ exact BigInt matvec replay; Rayleigh quotient " +
      "nonnegative (XᵀX is PSD) and consistent with the ledger") {
    val got = SparkEntry.queries("vec_power_iter")(spark, Sf001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2),
        r.getDouble(3)))
    assert(got.length == Vectors.Dim)
    val v = (1 to Vectors.Dim).map(j => Vectors.plane(64, j).toLong)
    val e = Tables.embeddings(spark, Sf001)
      .collect().map(_.getSeq[Float](1)
        .map(x => math.floor(x.toDouble * 1000).toLong).toArray)
    val dv = e.map(x => (0 until Vectors.Dim).map(j =>
      BigInt(x(j)) * v(j)).sum)
    val want = (0 until Vectors.Dim).map { j =>
      e.zip(dv).map { case (x, d) => BigInt(x(j)) * d }.sum }
    got.foreach { case (dim, seed, xtxv, _) =>
      assert(seed == v(dim - 1), s"dim $dim seed")
      assert(BigInt(xtxv) == want(dim - 1), s"dim $dim matvec")
    }
    val vts = (0 until Vectors.Dim).map(j => want(j) * v(j)).sum
    val vv = v.map(x => BigInt(x) * x).sum
    val rayleigh = got.head._4
    assert(got.forall(_._4 == rayleigh), "rayleigh must be constant")
    assert(rayleigh >= 0.0, "vᵀXᵀXv = |Xv|² must be nonnegative")
    assert(rayleigh == vts.toDouble / vv.toDouble, "rayleigh replay")
  }

  test("vec_confusion ≡ exact integer replay; rows partition the " +
      "corpus and the diagonal dominates chance") {
    val got = SparkEntry.queries("vec_confusion")(spark, Sf001)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val e = Tables.embeddings(spark, Sf001)
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong),
        r.getInt(2)))
    val cent = e.groupBy(_._3).view.mapValues { xs =>
      (0 until Vectors.Dim).map { j =>
        val s = xs.map(_._2(j)).sum
        math.floor(s.toDouble / xs.length).toLong }
    }.toMap
    val want = e.map { case (_, xq, label) =>
      val pred = cent.toSeq.map { case (cl, mq) =>
        val dist = (0 until Vectors.Dim)
          .map(j => (xq(j) - mq(j)) * (xq(j) - mq(j))).sum
        (dist * 100 + cl, cl) }.min._2
      (label, pred)
    }.groupBy(identity).view.mapValues(_.length.toLong).toMap
    assert(got == want, "confusion replay diverges")
    assert(got.values.sum == e.length.toLong)
    val diag = got.collect { case ((l, p), n) if l == p => n }.sum
    assert(diag * 10 > got.values.sum,
      "nearest-centroid no better than chance — fixture degenerate")
  }

  test("vec_covariance ≡ exact integer replay; diagonal is the " +
      "variance (non-negative) and the matrix is PSD-consistent") {
    val got = SparkEntry.queries("vec_covariance")(spark, Sf001)
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5),
          r.getDouble(6))).toMap
    assert(got.size == 36) // 8·9/2 upper-triangle cells
    val q = Tables.embeddings(spark, Sf001).collect()
      .map(_.getSeq[Float](1).take(8)
        .map(x => math.floor(x.toDouble * 1000).toLong))
    val n = q.length.toLong
    for (i <- 1 to 8; j <- i to 8) {
      val qi = q.map(_(i - 1))
      val qj = q.map(_(j - 1))
      val (si, sj) = (qi.sum, qj.sum)
      val sij = qi.zip(qj).map { case (a, b) => a * b }.sum
      val cov = (sij.toDouble - si.toDouble * sj.toDouble / n) / n / 1e6
      assert(got((i, j)) == ((n, si, sj, sij, cov)), s"cell ($i,$j)")
      if (i == j) assert(cov >= 0.0, s"negative variance at dim $i")
    }
    // Cauchy–Schwarz on every off-diagonal: |cov(i,j)|² ≤ var(i)·var(j)
    for (i <- 1 to 8; j <- i + 1 to 8) {
      val c = got((i, j))._5
      assert(c * c <= got((i, i))._5 * got((j, j))._5 * (1 + 1e-12),
        s"Cauchy-Schwarz violated at ($i,$j)")
    }
  }

  test("cellLocalComponents ≡ the iterative min-label CC on the real " +
      "semantic pair graph, and on a planted chain (transitivity)") {
    import org.apache.spark.sql.functions._
    // the real graph: dedup_semantic's own pairs at sf0.001
    val assigned = operators.Vectors
      .semanticAssigned(spark, Sf001, operators.Vectors.FixedNList)
    val pairs = operators.Vectors.semanticPairs(assigned)
    val local = operators.Vectors.cellLocalComponents(pairs)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val loop = operators.Graph.connectedComponents(
        pairs.select(col("src").as("id"))
          .unionByName(pairs.select(col("dst").as("id"))).distinct(),
        pairs.select("src", "dst"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(local == loop,
      "cell-local union-find diverges from the iterative CC labels")
    assert(local.nonEmpty, "fixture produced no semantic pairs — vacuous")
    // planted: a 4-chain (transitive closure through intermediates) and
    // a separate 2-clique inside one cell; min-id labels expected
    import spark.implicits._
    val planted = Seq((3, 10L, 11L), (3, 11L, 12L), (3, 12L, 13L),
      (3, 20L, 21L)).toDF("list_id", "src", "dst")
    val got = operators.Vectors.cellLocalComponents(planted)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == Map(10L -> 10L, 11L -> 10L, 12L -> 10L, 13L -> 10L,
      20L -> 20L, 21L -> 20L))
  }
}
