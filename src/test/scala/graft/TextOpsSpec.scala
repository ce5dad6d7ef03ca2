package graft

import graft.SparkSuite.Sf001

/** Dedup-family semantics: exact dedup collapses planted clones, MinHash
  * bands recover planted near-duplicates, SimHash is stable. */
class TextOpsSpec extends SparkSuite {

  /** Planted-clone id offset — scale-derived since r11 (the literal
    * 10000 collided with real ids at sf1); identical for the sf0.001
    * and sf0.01 fixtures (both 500 docs -> 1000). */
  private lazy val off = operators.TextOps.cloneOff(spark, Sf001)

  test("dedup_exact: every planted clone collapses onto its source") {
    val rows = SparkEntry.queries("dedup_exact")(spark, Sf001).collect()
    val byCopies = rows.groupBy(_.getLong(2))
    // 100 planted clones (doc_id%5=0 of 500) → 100 groups of 2, 400 of 1
    assert(byCopies(2L).length == 100)
    assert(byCopies(1L).length == 400)
    // survivor is always the original (min doc_id < off)
    assert(rows.forall(_.getLong(1) < off))
  }

  test("dedup_minhash: planted near-duplicates are found as candidates") {
    val pairs = SparkEntry.queries("dedup_minhash")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-clones are doc_id → doc_id+off with a 2-token tail change;
    // at least 80% must share a MinHash band (2 bands × 2 hashes)
    val planted = (0 until 500 by 10).map(i => (i.toLong, (i + off)))
    val found = planted.count(pairs.contains)
    assert(found >= (planted.size * 8) / 10, s"found only $found/${planted.size}")
  }

  test("dedup_ngram_jaccard: jaccard bounded and symmetric-keyed") {
    val rows = SparkEntry.queries("dedup_ngram_jaccard")(spark, Sf001).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(5)
      assert(j > 0.0 && j <= 1.0)
    }
  }

  test("dedup_simhash: 16-bit range, deterministic across runs") {
    val a = SparkEntry.queries("dedup_simhash")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    val b = SparkEntry.queries("dedup_simhash")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getInt(1)))
    assert(a.sameElements(b))
    assert(a.forall { case (_, h) => h >= 0 && h < (1 << 16) })
  }

  test("txt_zipf_rank: ranks bounded by K, ratios internally consistent, " +
      "vocab broadcasts") {
    val df = SparkEntry.queries("txt_zipf_rank")(spark, Sf001)
    val rows = df.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (n, oov, ratio) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(oov >= 0 && oov <= n)
      assert(ratio == oov.toDouble / n)
      if (n > oov) {
        val mean = r.getDouble(4)
        // in-vocab mean rank lives in [1, K]
        assert(mean >= 1.0 && mean <= 20.0, s"mean_rank $mean")
      } else assert(r.isNullAt(4))
    }
    // the 31-term fixture vs K=20 leaves a real OOV tail
    assert(rows.exists(_.getLong(2) > 0))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(800))
  }

  test("txt_langid picks argmax with deterministic tie-break") {
    val rows = SparkEntry.queries("txt_langid")(spark, Sf001).collect()
    rows.foreach { r =>
      val scores = Map("en" -> r.getLong(1), "de" -> r.getLong(2),
        "es" -> r.getLong(3), "fr" -> r.getLong(4))
      val pred = r.getString(5)
      if (scores.values.forall(_ == 0)) assert(pred == "zh")
      else assert(scores(pred) == scores.values.max)
    }
  }

  test("txt_chunk: windows cover every token and overlap by stride") {
    val rows = SparkEntry.queries("txt_chunk")(spark, Sf001).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    byDoc.values.foreach { cs =>
      val sorted = cs.sortBy(_.getLong(2))
      // starts are 0, 6, 12, …; adjacent windows (size 8) overlap by 2
      sorted.zipWithIndex.foreach { case (r, i) =>
        assert(r.getLong(2) == 6L * i && r.getInt(1) == i)
      }
      // last chunk reaches the end: start + n_chunk == n_tokens
      val last = sorted.last
      assert(last.getLong(3) <= 8 && last.getLong(3) >= 1)
      // chunk text has exactly n_chunk tokens
      sorted.foreach(r =>
        assert(r.getString(4).split(" ").count(_.nonEmpty) == r.getLong(3)))
    }
  }

  test("txt_mix: oversized languages downsampled toward the average, rest whole") {
    val docs = Tables.documents(spark, Sf001)
    val before = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val avg = before.values.sum.toDouble / before.size
    val after = SparkEntry.queries("txt_mix")(spark, Sf001).collect()
      .groupBy(_.getString(1)).view.mapValues(_.length.toLong).toMap
    before.foreach { case (lang, n) =>
      if (n <= avg) assert(after(lang) == n, s"$lang must pass whole")
      else {
        // md5-threshold sampling: expect ≈ avg kept, binomial tolerance
        val kept = after(lang)
        assert(kept < n && math.abs(kept - avg) < 4 * math.sqrt(avg),
          s"$lang kept $kept of $n, want ≈ $avg")
      }
    }
  }

  test("vec_mrl: truncated prefix re-normalizes to unit length") {
    val rows = SparkEntry.queries("vec_mrl")(spark, Sf001).collect()
    assert(rows.length == 500 * 16)
    rows.groupBy(_.getLong(0)).values.foreach { vs =>
      val norm = math.sqrt(vs.map(r => r.getDouble(2) * r.getDouble(2)).sum)
      assert(math.abs(norm - 1.0) < 1e-9)
    }
  }

  test("dedup_containment: sound vs brute-force sets; clone recall pinned") {
    val out = SparkEntry.queries("dedup_containment")(
      spark, SparkSuite.Sf0001).collect()
    assert(out.nonEmpty)
    // independent reference: bigram shingle sets in plain Scala over
    // the same near-clone corpus. The query's candidates are MinHash-
    // banded, so its output is a SUBSET of all C ≥ 0.8 pairs — every
    // reported pair must be exactly right (soundness), and the seeded
    // source→clone near-supersets (J ≈ 0.95 → band hit ≈ 1) must all
    // be present (recall pin).
    val docs = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val corpus = docs ++ docs.filter(_._1 % 10 == 0)
      .map { case (id, t) => (id + off, t + " zz9 qq8") }
    val sets = corpus.flatMap { case (id, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length < 2) None
      else Some(id -> t.sliding(2).map(_.mkString(" ")).toSet)
    }.toMap
    val want = (for {
      (a, sa) <- sets.toSeq; (b, sb) <- sets.toSeq if a != b
      inter = (sa & sb).size if 5 * inter >= 4 * sa.size
    } yield (a, b) -> (inter.toLong, sa.size.toLong, sb.size.toLong,
      100L * inter / sa.size)).toMap
    val got = out.map(r => (r.getLong(0), r.getLong(1)) ->
      (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    got.foreach { case (pair, v) =>
      assert(want.contains(pair), s"false positive $pair")
      assert(want(pair) == v, s"$pair: got $v want ${want(pair)}")
    }
    // every source is contained in its tail-padded clone — all such
    // directed pairs must be reported
    val clonePairs = sets.keys.filter(_ >= off)
      .map(c => (c - off, c)).filter(want.contains).toSeq
    assert(clonePairs.nonEmpty, "fixture produced no clone pairs")
    clonePairs.foreach { p =>
      assert(got.contains(p), s"missed source→clone containment $p")
    }
  }

  test("txt_bpe_merges ≡ plain-Scala BPE trainer on the same weighted " +
      "vocabulary; max pair count non-increasing") {
    val got = SparkEntry.queries("txt_bpe_merges")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2),
        r.getLong(3)))
    assert(got.length == 4)
    // independent trainer: greedy left-to-right fold, count-desc then
    // lexicographic argmax — textbook BPE on (distinct word, count)
    val vocab = Tables.documents(spark, SparkSuite.Sf0001)
      .select("text").collect().map(_.getString(0))
      .flatMap(_.split(" ").filter(_.nonEmpty))
      .groupBy(identity).map { case (w, xs) => w -> xs.length.toLong }
    var words: Map[Vector[String], Long] =
      vocab.groupBy { case (w, _) => w.map(_.toString).toVector }
        .map { case (t, m) => t -> m.values.sum }
    val expect = (1 to 4).map { i =>
      val counts = words.toSeq.flatMap { case (toks, w) =>
        toks.sliding(2).filter(_.length == 2)
          .map(p => (p(0), p(1)) -> w)
      }.groupBy(_._1).map { case (p, xs) => p -> xs.map(_._2).sum }
      val ((l, r), c) = counts.minBy { case ((l, r), c) => (-c, l, r) }
      words = words.groupBy { case (toks, _) =>
        toks.foldLeft(Vector.empty[String]) { (acc, t) =>
          if (acc.nonEmpty && acc.last == l && t == r)
            acc.init :+ (l + r)
          else acc :+ t
        }
      }.map { case (t, m) => t -> m.values.sum }
      (i.toLong, l, r, c)
    }
    assert(got.toSeq == expect,
      s"BPE rules diverge:\n  spark=${got.toSeq}\n  scala=$expect")
    // merging can only remove occurrences of existing pairs, and a new
    // pair's count is bounded by its creator's — the max is monotone
    got.sliding(2).foreach { case Array((_, _, _, c1), (_, _, _, c2)) =>
      assert(c2 <= c1, s"pair count rose $c1 -> $c2") }

    // ── the APPLICATION half: txt_bpe_encode's token ledger must equal
    // the replay's post-merge state aggregated the same way (top-20 by
    // weighted occurrence, count-desc then token asc) — and because
    // both queries consume ONE memoized fit, this also pins that the
    // shared state is the post-round-4 one, not a stale round
    val enc = SparkEntry.queries("txt_bpe_encode")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getBoolean(2)))
    val ledger = words.toSeq.flatMap { case (toks, w) => toks.map(_ -> w) }
      .groupBy(_._1).map { case (t, xs) => (t, xs.map(_._2).sum) }
      .toSeq.sortBy { case (t, n) => (-n, t) }.take(20)
      .map { case (t, n) => (t, n, t.length > 1) }
    assert(enc.toSeq == ledger,
      s"encode ledger diverges:\n  spark=${enc.toSeq}\n  scala=$ledger")
    // the learned merges must actually absorb corpus mass: at least one
    // multi-char token appears in the top-20
    assert(enc.exists(_._3), "no merged token reached the top-20")

    // ── the ECONOMICS half: txt_bpe_compression's per-length ledger
    // must equal the replay state bucketed the same way, and tokens
    // can never exceed chars (merges only shrink sequences)
    val cmp = SparkEntry.queries("txt_bpe_compression")(
        spark, SparkSuite.Sf0001)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val wantCmp = words.toSeq
      .map { case (toks, w) => (toks.map(_.length).sum.toLong,
        toks.length.toLong, w) }
      .groupBy(_._1).map { case (nChr, xs) =>
        val nWords = xs.map(_._3).sum
        val chars = nChr * nWords
        val toksN = xs.map(t => t._2 * t._3).sum
        nChr -> (nWords, chars, toksN, chars.toDouble / toksN.toDouble)
      }
    assert(cmp.toMap == wantCmp, "compression ledger diverges from replay")
    cmp.foreach { case (nChr, (_, chars, toksN, ratio)) =>
      assert(toksN <= chars, s"len $nChr: tokens exceed chars")
      assert(ratio >= 1.0, s"len $nChr: ratio below 1")
    }
    // the merges must help somewhere: at least one bucket compresses
    assert(cmp.exists(_._2._4 > 1.0), "no bucket compressed at all")
  }

  test("txt_boilerplate ≡ plain-Scala CCNet segment-dedup replay; " +
      "token conservation holds per doc") {
    val got = SparkEntry.queries("txt_boilerplate")(spark, SparkSuite.Sf0001)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toMap
    assert(got.nonEmpty)
    // independent replay: 8-token non-overlapping segments, DF over
    // distinct (segment, doc), boiler = shared by >= 2 docs
    val docs = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").filter(_.nonEmpty))
      .filter(_._2.nonEmpty)
    val segs = docs.flatMap { case (id, t) =>
      t.grouped(8).map(g => (id, g.mkString(" "), g.length.toLong)) }
    val dfm = segs.map { case (id, s, _) => (s, id) }.distinct
      .groupBy(_._1).map { case (s, xs) => s -> xs.length }
    val expect = segs.groupBy(_._1).map { case (id, xs) =>
      val boiler = xs.count { case (_, s, _) => dfm(s) >= 2 }
      val total = xs.map(_._3).sum
      val kept = xs.filter { case (_, s, _) => dfm(s) < 2 }.map(_._3).sum
      id -> (xs.length.toLong, boiler.toLong, total, kept)
    }
    assert(got == expect, "spark ledger diverges from the Scala replay")
    // conservation: kept tokens + boiler-segment tokens = total tokens,
    // and the corpus genuinely contains shared segments (non-degenerate)
    got.foreach { case (id, (nSeg, nBoil, total, kept)) =>
      assert(nBoil <= nSeg && kept <= total,
        s"doc $id: ledger arithmetic broken")
    }
    assert(got.values.map(_._2).sum > 0,
      "fixture degenerate: no cross-document segments at all")
  }

  test("dedup_containment_ensemble: directed, sound vs the flat query, " +
      "all three size partitions live, planted recall ≥ 90%") {
    val ens = SparkEntry.queries("dedup_containment_ensemble")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    assert(ens.nonEmpty)
    // direction law: the probe gate admits only |A| ≤ |B| (contained →
    // container), so every row must satisfy it
    ens.foreach { case (a, b, p, _, na, nb, _) =>
      assert(na <= nb, s"undirected pair ($a,$b) in partition $p") }
    // soundness: looser banding can only ADD candidates; the exact
    // 5·I ≥ 4·|A| gate is shared, so every ensemble pair must appear
    // in the flat dedup_containment output with identical counts
    val flat = SparkEntry.queries("dedup_containment")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    ens.foreach { case (a, b, p, i, na, nb, c) =>
      assert(flat.get((a, b)).contains((i, na, nb, c)),
        s"partition-$p pair ($a,$b) diverges from the flat gate") }
    // scheme coverage: the 32/64 size split must exercise all three
    // banding schemes on this corpus or the ensemble degenerates to
    // one flat index
    val parts = ens.map(_._3).toSet
    assert(parts == Set(0L, 1L, 2L),
      s"size partitions $parts — expected all of {0,1,2}")
    // planted source→clone recall: the strict 1×4 small partition
    // trades a little recall (band hit = J⁴ ≈ 0.81 at J ≈ 0.95) for
    // candidate volume; ≥ 90% of planted directed pairs must survive
    val clonePairs = ens.collect {
      case (a, b, _, _, _, _, _) if b == a + off => (a, b) }.toSet
    val planted = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id").collect().map(_.getLong(0))
      .filter(_ % 10 == 0).map(i => (i, i + off)).toSet
    assert(planted.nonEmpty)
    assert(clonePairs.size * 10 >= planted.size * 9,
      s"planted recall ${clonePairs.size}/${planted.size} below 90%")
  }

  test("dedup_substring ≡ in-JVM replay on sf0.001; clones marked whole") {
    val out = SparkEntry.queries("dedup_substring")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.nonEmpty)
    val docs = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val corpus = docs ++ docs.filter(_._1 % 10 == 0)
      .map { case (id, t) => (id + off, t + " zz9 qq8") }
    val grams = corpus.flatMap { case (id, text) =>
      val t = text.split(" ").filter(_.nonEmpty)
      if (t.length < 8) Nil
      else t.sliding(8).zipWithIndex.map { case (g, i0) =>
        (id, i0 + 1, g.mkString(" ")) }.toSeq
    }
    val dup = grams.groupBy(_._3).filter(_._2.size >= 2).keySet
    val want = grams.filter(g => dup(g._3))
      .groupBy(_._1).toSeq.flatMap { case (id, occ) =>
        // merge overlapping [i, i+7] spans in start order
        val spans = occ.map(_._2).sorted.map(i => (i.toLong, i + 7L))
        spans.tail.foldLeft(List(spans.head)) { case (acc, (s, e)) =>
          val (cs, ce) = acc.head
          if (s > ce) (s, e) :: acc else (cs, math.max(ce, e)) :: acc.tail
        }.reverse.map { case (s, e) => (id, s, e, e - s + 1) }
      }.sortBy(t => (t._1, t._2))
    assert(out.toSeq == want,
      s"got ${out.length} spans, want ${want.length}")
    // a cloned source doc is duplicated end to end: its merged span
    // must cover every gram position (1 .. n-7 start, so end = n)
    val lens = corpus.toMap.map { case (id, t) =>
      id -> t.split(" ").count(_.nonEmpty) }
    val cloneIds = corpus.map(_._1).filter(_ >= off)
      .map(_ - off).filter(lens(_) >= 8)
    assert(cloneIds.nonEmpty)
    cloneIds.foreach { id =>
      val spans = out.filter(_._1 == id)
      assert(spans.length == 1 && spans.head._2 == 1L &&
        spans.head._3 == lens(id).toLong,
        s"doc $id not marked whole: ${spans.mkString(",")}")
    }
  }

  test("dedup_substring_cut: token conservation; whole-clone docs " +
      "come back empty") {
    val out = SparkEntry.queries("dedup_substring_cut")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val docs = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val corpus = (docs ++ docs.filter(_._1 % 10 == 0)
      .map { case (id, t) => (id + off, t + " zz9 qq8") }).toMap
    // every corpus doc present exactly once
    assert(out.map(_._1).sorted == corpus.keys.toSeq.sorted)
    def ntoks(t: String) = t.split(" ").count(_.nonEmpty)
    out.foreach { case (id, clean, removed) =>
      // conservation: kept + removed = original token count
      assert(ntoks(clean) + removed == ntoks(corpus(id)),
        s"doc $id: ${ntoks(clean)} kept + $removed removed != " +
          s"${ntoks(corpus(id))}")
      // kept text is a subsequence of the original (cutting reorders
      // nothing)
      val it = corpus(id).split(" ").filter(_.nonEmpty).iterator
      assert(clean.split(" ").filter(_.nonEmpty)
        .forall(tok => it.contains(tok)), s"doc $id not a subsequence")
    }
    // a doc duplicated end-to-end by its clone is cut to nothing
    val whole = docs.filter { case (id, t) => id % 10 == 0 && ntoks(t) >= 8 }
    assert(whole.nonEmpty)
    whole.foreach { case (id, _) =>
      assert(out.find(_._1 == id).get._2 == "", s"doc $id not emptied")
    }
  }

  test("txt_upsample: copy counts follow the source budget exactly") {
    val rows = SparkEntry.queries("txt_upsample")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2),
        r.getDouble(3)))
    val byDoc = rows.groupBy(_._1)
    byDoc.foreach { case (_, copies) =>
      val n = copies.length
      val epochs = copies.head._4
      // floor(epochs) <= copies <= ceil(epochs), copy ids dense from 1
      assert(n >= epochs.floor.toInt && n <= epochs.ceil.toInt)
      assert(copies.map(_._2).sorted.toSeq == (1L to n).toSeq)
    }
    // integer-epoch sources replicate exactly; fractional ones land
    // between floor and ceil in aggregate (the md5 coin is ~fair)
    val bySource = rows.groupBy(_._3)
    bySource.foreach { case (_, rs) =>
      val epochs = rs.head._4
      val docs = rs.map(_._1).distinct.length
      if (epochs == epochs.floor)
        assert(rs.length == docs * epochs.toInt)
      else {
        assert(rs.length >= docs * epochs.floor.toInt &&
          rs.length <= docs * epochs.ceil.toInt)
      }
    }
  }

  test("txt_shuffle_shard: a permutation into 16 shards with dense " +
      "positions, reproducible from the salt alone") {
    val rows = SparkEntry.queries("txt_shuffle_shard")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    val nDocs = Tables.documents(spark, SparkSuite.Sf0001).count()
    // every doc exactly once, shards in [0, 16)
    assert(rows.length == nDocs)
    assert(rows.map(_._3).distinct.length == nDocs)
    assert(rows.forall(r => r._1 >= 0 && r._1 < 16))
    // positions dense 1..n per shard
    rows.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._2).sorted.toSeq == (1L to rs.length).toSeq)
    }
    // deterministic: a second run is bit-identical (no RNG state)
    val again = SparkEntry.queries("txt_shuffle_shard")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSeq == again.toSeq)
  }

  test("chk_snapshot_diff: all four branches populated and totals " +
      "conserve both snapshots") {
    val rows = SparkEntry.queries("chk_snapshot_diff")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    val (added, removed, changed, unchanged) =
      (rows.map(_._2).sum, rows.map(_._3).sum,
        rows.map(_._4).sum, rows.map(_._5).sum)
    assert(added > 0 && removed > 0 && changed > 0 && unchanged > 0)
    val n = Tables.documents(spark, SparkSuite.Sf0001).count()
    // v1 = removed + changed + unchanged; v2 = added + changed + unchanged
    assert(removed + changed + unchanged == n)
    assert(added + changed + unchanged ==
      n - n / 13 - 1 + n / 10) // %13 drops (incl. 0), %10 clones (incl. 0)
  }

  test("txt_bigram_novelty ≡ in-JVM brute force on sf0.001") {
    val out = SparkEntry.queries("txt_bigram_novelty")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val docs = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ")
        .filter(_.nonEmpty).toSeq)
    val types = docs.map { case (id, t) =>
      id -> t.sliding(2).filter(_.length == 2)
        .map(_.mkString(" ")).toSet }.toMap
    val df = types.values.flatten
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val want = types.collect { case (id, tp) if tp.nonEmpty =>
      val uniq = tp.count(df(_) == 1).toLong
      val sumDf = tp.toSeq.map(df).sum
      id -> (tp.size.toLong, uniq, (100 * uniq) / tp.size,
        sumDf.toDouble / tp.size)
    }
    assert(out == want, s"got ${out.size} docs, want ${want.size}")
  }

  test("gopherRules: each rule rejects exactly its planted violation") {
    val sp = spark
    import sp.implicits._
    // one clean doc plus one violator per rule, orthogonal by design:
    // every violator satisfies the four OTHER rules
    def words(n: Int, w: String) = (Seq("the", "of") ++ Seq.fill(n - 2)(w))
      .mkString(" ")
    val corpus = Seq(
      1L -> words(60, "quality"),                  // clean: all pass
      2L -> words(10, "quality"),                  // too short (wc)
      3L -> words(60, "qual#ity"),                 // 58 '#' ≥ 60/10 (sym)
      4L -> (Seq("the", "of") ++ Seq.fill(58)("a")).mkString(" "), // mwl<3
      5L -> words(60, "12345"),                    // digits: alpha < 80%
      6L -> Seq.fill(60)("table").mkString(" "))   // no stop markers
    val got = graft.operators.TextOps.gopherRules(
      corpus.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) ->
        (r.getBoolean(6), r.getBoolean(7), r.getBoolean(8),
          r.getBoolean(9), r.getBoolean(10), r.getBoolean(11))).toMap
    // (ok_words, ok_mwl, ok_sym, ok_alpha, ok_stop, pass)
    assert(got(1L) == ((true, true, true, true, true, true)))
    assert(got(2L) == ((false, true, true, true, true, false)))
    assert(got(3L) == ((true, true, false, true, true, false)))
    assert(got(4L) == ((true, false, true, true, true, false)))
    assert(got(5L) == ((true, true, true, false, true, false)))
    assert(got(6L) == ((true, true, true, true, false, false)))
  }

  test("txt_gopher_rules: fixture rejection profile is the recorded one") {
    val rows = SparkEntry.queries("txt_gopher_rules")(spark, Sf001).collect()
    assert(rows.length == 500)
    // clean word-salad fixture: wc rule rejects some, stop rule rejects
    // all (vocab has only 'the' from the marker set), rest pass
    assert(rows.count(!_.getBoolean(6)) > 0, "wc rule never fired")
    assert(rows.forall(!_.getBoolean(10)), "stop rule should reject all")
    assert(rows.forall(r => r.getBoolean(7) && r.getBoolean(8) &&
      r.getBoolean(9)), "mwl/sym/alpha must pass on the clean fixture")
    assert(rows.forall(!_.getBoolean(11)))
  }

  test("sim_containment_lsh: quotes recall their host docs, the gate " +
      "holds, and a genuine low-J/high-C hit exists") {
    val rows = SparkEntry.queries("sim_containment_lsh")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    // exact invariants on every surviving pair
    rows.foreach { case (q, d, i, nq, nd, pct) =>
      assert(i <= math.min(nq, nd), s"($q,$d): inter exceeds a set size")
      assert(5 * i >= 4 * nq, s"($q,$d): gate violated")
      assert(pct == 100 * i / nq, s"($q,$d): cont_pct mismatch")
    }
    // a quote's shingle set is a SUBSET of its own doc's, so every
    // self-pair the banding recalls must be perfect containment...
    val self = rows.filter(r => r._1 == r._2)
    assert(self.forall(_._6 == 100), "self-pair below C=1.0")
    // ...and recall is the banding's only loss: ≥ 90% of quotes find
    // their host (2/50 missed on this fixture is the recorded trade)
    assert(self.length >= 45, s"self recall ${self.length}/50")
    // the case the ensemble EXISTS for: containment in a document much
    // larger than the quote (low Jaccard, high containment)
    assert(rows.exists(r => r._1 != r._2 && r._5 >= 2 * r._4 && r._6 >= 80),
      "no low-J/high-C hit — the size-banded probe lost its point")
  }

  test("txt_cosine_topk ≡ in-JVM brute-force sparse cosine, every list") {
    val got = SparkEntry.queries("txt_cosine_topk")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val dTf = docs.map { case (id, t) =>
      id -> t.groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val d2 = dTf.view.mapValues(m => m.values.map(x => x * x).sum).toMap
    docs.filter(_._1 < 50).foreach { case (qid, t) =>
      val qTf = t.take(30).groupBy(identity).view.mapValues(_.size.toLong)
        .toMap
      val q2 = qTf.values.map(x => x * x).sum
      val scored = dTf.toSeq.flatMap { case (d, m) =>
        val num = qTf.map { case (w, f) => f * m.getOrElse(w, 0L) }.sum
        if (num == 0) None
        else Some((d, num, num.toDouble / math.sqrt(q2.toDouble * d2(d))))
      }.sortBy { case (d, _, c) => (-c, d) }.take(3)
      scored.zipWithIndex.foreach { case ((d, num, cos), i) =>
        val (gd, gn, gc) = got((qid, i + 1))
        assert(gd == d && gn == num, s"q$qid rank ${i + 1}: ($gd,$gn) " +
          s"vs ($d,$num)")
        assert(math.abs(gc - cos) < 1e-12, s"q$qid rank ${i + 1} cos")
      }
      // a quote shares every token with its host: the self doc must
      // appear somewhere in its own top-3
      assert(scored.exists(_._1 == qid) == got.exists { case ((q, _), v) =>
        q == qid && v._1 == qid }, s"q$qid self-hit disagreement")
    }
  }

  test("txt_pmi_bigrams: lift replays from exact corpus counts; " +
      "top-50 ranking deterministic") {
    val got = SparkEntry.queries("txt_pmi_bigrams")(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5)))
    assert(got.length == 50)
    // exact in-JVM replay of the counts
    val docs = Tables.documents(spark, Sf001).select("text").collect()
      .map(_.getString(0).split(" ").filter(_.nonEmpty).toSeq)
    val uni = docs.flatten.groupBy(identity).map { case (w, g) => w -> g.size.toLong }
    val bi = docs.flatMap(t => t.sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1)))).groupBy(identity)
      .map { case (b, g) => b -> g.size.toLong }
    val nu = uni.values.sum
    val nb = bi.values.sum
    got.foreach { case (w1, w2, np, n1, n2, lift) =>
      assert(bi((w1, w2)) == np && uni(w1) == n1 && uni(w2) == n2,
        s"counts for ($w1,$w2)")
      val want = (np.toDouble / nb) / ((n1.toDouble / nu) * (n2.toDouble / nu))
      assert(lift == want, s"lift for ($w1,$w2)")
    }
    // non-increasing lift (exact tie order is the oracle's concern)
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._6 >= b._6, "ranking order")
      case _ => ()
    }
  }

  test("txt_entropy: quantized-entropy invariants + exact one-doc replay") {
    val rows = SparkEntry.queries("txt_entropy")(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, n, types, hapax, h, ttr) =>
      assert(hapax <= types && types <= n, s"doc $id counters")
      // H in [0, ln n] up to the 1e-6 fixed-point quantization
      assert(h >= -1e-6 && h <= math.log(n.toDouble) + 1e-6, s"doc $id H=$h")
      assert(ttr == types.toDouble / n, s"doc $id ttr")
    }
    // exact replay for one doc, including the fixed-point contract
    val (id0, n0, _, _, h0, _) = rows.minBy(_._1)
    val text = Tables.documents(spark, Sf001)
      .filter(org.apache.spark.sql.functions.col("doc_id") === id0)
      .select("text").collect().head.getString(0)
    val cs = text.split(" ").filter(_.nonEmpty).groupBy(identity)
      .map(_._2.size.toLong)
    val sfp = cs.map(c => math.floor(c.toDouble * math.log(c.toDouble)
      * 1e6).toLong).sum
    val want = (math.floor(math.log(n0.toDouble) * 1e6).toLong * n0 - sfp)
      .toDouble / n0 / 1e6
    assert(h0 == want, s"doc $id0 entropy replay")
  }

  test("txt_lm_score: MLE sanity (avg_lp <= 0; per-prefix probs sum to 1) " +
      "+ exact one-doc replay") {
    val rows = SparkEntry.queries("txt_lm_score")(spark, Sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    rows.foreach { case (id, nb, lp) =>
      assert(nb >= 1 && lp <= 0.0, s"doc $id n=$nb avg_lp=$lp") }
    // model replay: bigram MLE over the corpus, fixed-point scoring
    val docs = Tables.documents(spark, Sf001).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
    val allBi = docs.flatMap(_._2.sliding(2).filter(_.size == 2)
      .map(p => (p(0), p(1))))
    val cb = allBi.groupBy(identity).map { case (b, g) => b -> g.size.toLong }
    val cw = cb.groupBy(_._1._1).map { case (w, g) => w -> g.values.sum }
    // per-prefix conditional probabilities sum to 1 exactly (rationals)
    cw.keys.take(20).foreach { w =>
      val s = cb.collect { case ((a, _), c) if a == w => c }.sum
      assert(s == cw(w), s"prefix $w mass")
    }
    val (idR, toksR) = docs.minBy(_._1)
    val fps = toksR.sliding(2).filter(_.size == 2).map { p =>
      val b = (p(0), p(1))
      math.floor(math.log(cb(b).toDouble / cw(p(0))) * 1e6).toLong
    }.toSeq
    val want = fps.sum.toDouble / 1e6 / fps.size
    val gotR = rows.find(_._1 == idR).get
    assert(gotR._2 == fps.size && gotR._3 == want, s"doc $idR lm replay")
  }

  test("txt_winnowing: the w+k-1 guarantee catches EVERY planted " +
      "near-clone pair (not probabilistically), density is thinned") {
    val rows = SparkEntry.queries("txt_winnowing")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val pairs = rows.map(t => (t._1, t._2)).toSet
    assert(pairs.size == rows.length, "duplicate pair rows")
    assert(rows.forall(t => t._1 < t._2), "pair orientation broken")
    assert(rows.forall(_._3 >= 2), "reported pair below the share floor")
    // every planted near-clone shares its whole prefix (≫ w+k-1 = 7
    // tokens), so winnowing MUST surface each — this is the
    // deterministic guarantee MinHash banding does not have
    val docs = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id").collect().map(_.getLong(0))
    val planted = docs.filter(_ % 10 == 0).map(i => (i, i + off))
    val missed = planted.filterNot(pairs.contains)
    assert(missed.isEmpty, s"guarantee violated for: ${missed.take(5).toSeq}")
    // clone pairs must dominate organic word-salad overlap: each shares
    // (almost) every fingerprint, not a coincidental handful
    val byPair = rows.map(t => (t._1, t._2) -> t._3).toMap
    val organicMax = rows.collect {
      case (a, b, n) if !planted.contains((a, b)) => n
    }.foldLeft(0L)(math.max)
    planted.foreach { p =>
      assert(byPair(p) >= 2, s"clone pair $p barely shares fingerprints")
    }
    assert(planted.map(byPair).max >= organicMax,
      "no clone pair outranks organic overlap — fixture degenerate")
  }

  test("txt_winnowing ≡ in-JVM fingerprint mirror, pair for pair " +
      "(the mirror KernelPropertySpec proves the guarantee on)") {
    val got = SparkEntry.queries("txt_winnowing")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def fps(toks: Seq[String]): Set[String] =
      if (toks.length < 4) Set.empty
      else {
        val hs = toks.sliding(4).map(g => md5hex(g.mkString(" "))).toVector
        (1 to math.max(1, hs.length - 3))
          .map(j => hs.slice(j - 1, j + 3).min).toSet
      }
    val base = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpus = base ++ base.filter(_._1 % 10 == 0)
      .map { case (id, t) => (id + off, t + " zz9 qq8") }
    val perDoc = corpus.map { case (id, t) =>
      id -> fps(t.split(" ").filter(_.nonEmpty).toSeq)
    }
    val df = perDoc.flatMap { case (id, f) => f.map(_ -> id) }
      .groupBy(_._1).map { case (fp, xs) => fp -> xs.length }
    val kept = perDoc.map { case (id, f) =>
      id -> f.filter(fp => df(fp) <= 20) }
    val want = (for {
      (a, fa) <- kept; (b, fb) <- kept if a < b
      shared = fa.intersect(fb).size if shared >= 2
    } yield (a, b, shared.toLong)).toSet
    assert(got == want,
      s"onlyQuery=${(got -- want).take(3)} onlyMirror=${(want -- got).take(3)}")
  }

  test("dedup_minhash_curve: candidate sets nest (1x4 ⊆ 2x2 ⊆ 4x1), so " +
      "recall and volume are monotone; the 2x2 row IS the kernel's") {
    val rows = SparkEntry.queries("dedup_minhash_curve")(spark, Sf001)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    assert(rows.keySet == Set("1x4", "2x2", "4x1"))
    val Seq(c14, c22, c41) = Seq("1x4", "2x2", "4x1").map(rows)
    // all-4-agree ⇒ both halves agree ⇒ any single hash agrees:
    // containment forces both monotonicities
    assert(c14._1 <= c22._1 && c22._1 <= c41._1, "volume not monotone")
    assert(c14._2 <= c22._2 && c22._2 <= c41._2, "recall not monotone")
    assert(c14._3 <= c22._3 && c22._3 <= c41._3)
    // the 2x2 point must equal the production kernel's own counters
    val recall = SparkEntry.queries("dedup_minhash_recall")(spark, Sf001)
      .collect().head
    assert(c22._1 == recall.getLong(2), "2x2 candidate volume drifted " +
      "from dedup_minhash_recall")
    assert(c22._2 == recall.getLong(1), "2x2 caught drifted")
    // the sweep must show a real trade on this corpus: 4x1 pays more
    // candidates than 2x2 for no extra recall here
    assert(c41._1 > c22._1)
  }

  test("pipeline_curate ≡ full in-JVM stage replay; the decontam stage " +
      "catches exactly the leakage dedup cannot") {
    val got = SparkEntry.queries("pipeline_curate")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def isEval(id: Long) = md5hex(s"eval#$id").substring(0, 2) < "10"
    def tk(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val base = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpus = base.filterNot(t => isEval(t._1)) ++
      base.filter(_._1 % 7 == 0).map { case (i, t) => (i + 2 * off, t) } ++
      base.filter(_._1 % 10 == 0)
        .map { case (i, t) => (i + off, t + " zz9 qq8") }
    val a2 = corpus.filter(t => tk(t._2).length >= 50)
    val a3 = a2.groupBy(t => md5hex(t._2)).values
      .map(_.minBy(_._1)).toSeq
    val labels = SparkEntry.queries("dedup_cc")(spark, SparkSuite.Sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val a3c = a3.map { case (i, t) => (i, t, labels.getOrElse(i, i)) }
    val aliveMin = a3c.groupBy(_._3).map { case (c, g) =>
      c -> g.map(_._1).min }
    val a4 = a3c.filter { case (i, _, c) => aliveMin(c) == i }
      .map(t => (t._1, t._2))
    def quad(t: String): Seq[String] =
      tk(t).sliding(4).filter(_.length == 4).map(_.mkString(" ")).toSeq
    val ev = base.filter(t => isEval(t._1)).flatMap(t => quad(t._2)).toSet
    val a5 = a4.filter { case (_, t) =>
      val sh = quad(t)
      2 * sh.count(ev.contains) < sh.length
    }
    def tokSum(xs: Seq[(Long, String)]) = xs.map(t => tk(t._2).length).sum
    assert(got("1_ingest") ==
      ((corpus.length.toLong, tokSum(corpus.toSeq).toLong)))
    assert(got("2_gate") == ((a2.length.toLong, tokSum(a2.toSeq).toLong)))
    assert(got("3_exact") == ((a3.length.toLong, tokSum(a3).toLong)))
    assert(got("4_near") == ((a4.length.toLong, tokSum(a4.toSeq).toLong)))
    assert(got("5_decontam") == ((a5.length.toLong, tokSum(a5).toLong)))
    // every stage strictly cuts except possibly the last; stage 5's
    // drops are EXACTLY the planted eval copies/clones — the leakage
    // dedup cannot see because its cluster-mates are outside the corpus
    assert(a2.length < corpus.length && a3.length < a2.length &&
      a4.length < a3.length)
    val dropped5 = a4.map(_._1).toSet -- a5.map(_._1).toSet
    assert(dropped5.nonEmpty, "no leakage reached the decontam gate — " +
      "fixture degenerate")
    dropped5.foreach { i =>
      val orig = if (i >= 2 * off) i - 2 * off else i - off
      assert(i >= off && isEval(orig),
        s"decontam dropped non-leakage doc $i")
    }
  }

  test("dedup_minhash_recall: the reported counters ARE the " +
      "dedup_minhash candidate list's, and recall clears the band floor") {
    val r = SparkEntry.queries("dedup_minhash_recall")(spark, Sf001)
      .collect().head
    val (nPlanted, nCaught, nCand, recallPpm) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    // replay against the candidate query itself
    val cand = SparkEntry.queries("dedup_minhash")(spark, Sf001)
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSet
    val docs = Tables.documents(spark, Sf001)
      .select("doc_id").collect().map(_.getLong(0))
    val planted = docs.filter(_ % 10 == 0).map(i => (i, i + off)).toSet
    assert(nPlanted == planted.size)
    assert(nCaught == planted.count(cand.contains))
    assert(nCand == cand.size)
    assert(recallPpm == nCaught * 1000000L / nPlanted)
    // the 2×2 banding's spec floor (dedup_minhash test): ≥ 80%
    assert(recallPpm >= 800000L, s"recall $recallPpm ppm below floor")
  }

  test("txt_vocab_coverage ≡ exact ranked-dictionary replay; coverage " +
      "monotone in k and consistent with txt_zipf_rank's ordering") {
    val got = SparkEntry.queries("txt_vocab_coverage")(
        spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    assert(got.map(_._1).toSeq == Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L))
    val counts = Tables.documents(spark, SparkSuite.Sf0001)
      .select("text").collect().flatMap(_.getString(0).split(" "))
      .filter(_.nonEmpty)
      .groupBy(identity).view.mapValues(_.length.toLong).toSeq
      .sortBy { case (t, n) => (-n, t) }
    val tot = counts.map(_._2).sum
    got.foreach { case (k, nTerms, covered, ppm, cov) =>
      val top = counts.take(k.toInt)
      assert(nTerms == math.min(k, counts.length.toLong), s"k=$k terms")
      assert(covered == top.map(_._2).sum, s"k=$k covered")
      assert(ppm == covered * 1000000L / tot, s"k=$k ppm")
      assert(cov == covered.toDouble / tot, s"k=$k coverage")
    }
    // more vocabulary never covers less, and the fixture is
    // non-degenerate: the largest k covers strictly more than k = 1
    got.sliding(2).foreach {
      case Array(a, b) => assert(a._3 <= b._3, s"coverage fell at ${b._1}")
      case _ => ()
    }
    assert(got.last._3 > got.head._3, "flat coverage curve")
  }

  test("dedup_bbit ≡ in-JVM 1-bit signature replay; estimator exact on " +
      "identical-signature pairs and err is its own audit") {
    val got = SparkEntry.queries("dedup_bbit")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.nonEmpty)
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    // replay: near-clone corpus -> bigram shingles -> 32 salted minima
    // -> last-hex-digit parity bits packed into one long
    val base = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val corpus = base ++ base.filter(_._1 % 10 == 0)
      .map { case (id, t) => (id + off, t + " zz9 qq8") }
    val shingles = corpus.map { case (id, t) =>
      val tk = t.split(" ").filter(_.nonEmpty)
      id -> tk.sliding(2).filter(_.length == 2).map(_.mkString(" ")).toSeq
    }.filter(_._2.nonEmpty).toMap
    val sig = shingles.map { case (id, sh) =>
      id -> (0 until 32).map { k =>
        val m = sh.map(x => md5hex(s"bb$k#" + x)).min
        if ("13579bdf".contains(m.last)) 1L << k else 0L
      }.sum
    }
    got.foreach { case ((a, b), (agree, jBbit, jExact, err)) =>
      val want = 32 - java.lang.Long.bitCount(sig(a) ^ sig(b))
      assert(agree == want.toLong, s"($a,$b) agree $agree vs replay $want")
      assert(jBbit == (agree * 2 - 32).toDouble / 32, s"($a,$b) estimator")
      assert(err == jBbit - jExact, s"($a,$b) err decomposition")
      assert(jExact >= 0.0 && jExact <= 1.0, s"($a,$b) exact out of range")
    }
    // planted tail-padded clones share almost all shingles: their
    // 1-bit signatures must agree on (nearly) every position
    val clonePairs = got.keys.filter { case (a, b) => b == a + off }
    assert(clonePairs.nonEmpty, "no planted clone pair in candidates")
    clonePairs.foreach { p =>
      assert(got(p)._1 >= 28, s"clone pair $p agreement ${got(p)._1}") }
    // the estimator is unbiased-ish in aggregate: mean err over all
    // candidate pairs is small even though single pairs wobble (b=1)
    val meanErr = got.values.map(_._4).sum / got.size
    assert(math.abs(meanErr) < 0.2, s"mean estimator error $meanErr")
  }

  test("txt_mix_temperature ≡ exact integer-sqrt replay; low-resource " +
      "languages boost, high-resource shrink, budget sums to ~one") {
    val got = SparkEntry.queries("txt_mix_temperature")(
        spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))
    assert(got.length >= 2)
    val counts = Tables.documents(spark, SparkSuite.Sf0001)
      .select("lang", "text").collect()
      .map(r => (r.getString(0),
        r.getString(1).split(" ").count(_.nonEmpty).toLong))
      .groupBy(_._1).map { case (l, xs) => l -> (xs.length.toLong,
        xs.map(_._2).sum) }
    val wants = counts.map { case (l, (nd, nt)) =>
      l -> (nd, nt, math.sqrt(nt.toDouble * 1000000).toLong)
    }
    val tw = wants.values.map(_._3).sum
    val tn = wants.values.map(_._2).sum
    got.foreach { case (l, nDocs, nTok, w, ppm, p, boost) =>
      val (wd, wt, ww) = wants(l)
      assert((nDocs, nTok, w) == ((wd, wt, ww)), s"$l integer ledger")
      assert(ppm == w * 1000000L / tw, s"$l ppm")
      assert(p == w.toDouble / tw, s"$l p_temp")
      assert(boost == (w.toDouble / tw) * (tn.toDouble / nTok), s"$l boost")
    }
    assert(math.abs(got.map(_._6).sum - 1.0) < 1e-12, "Σ p_temp ≠ 1")
    // α = 1/2 compresses the distribution: the largest language's
    // share shrinks, the smallest grows
    val byTok = got.sortBy(_._3)
    assert(byTok.head._7 > 1.0, "smallest language did not boost")
    assert(byTok.last._7 < 1.0, "largest language did not shrink")
  }

  test("txt_hash_embed ≡ in-JVM hashing-trick replay; unit norm and " +
      "dimension bounds hold") {
    // long form (doc_id, dim, cnt, emb_val) — reassemble per-doc cell
    // vectors; row order within a doc is the dim order, pinned by the
    // query's ORDER BY
    val rows = SparkEntry.queries("txt_hash_embed")(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Double])))
    val got = rows.groupBy(_._1).map { case (id, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (0L until 16L), s"doc $id dims")
      val counts = sorted.map(_._3).toSeq
      val ssq = counts.map(x => x * x).sum
      id -> (counts, ssq,
        sorted.map(_._4.map(Double.box).orNull).toSeq)
    }
    assert(got.nonEmpty)
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, SparkSuite.Sf0001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.foreach { case (id, text) =>
      val cells = Array.fill(16)(0L)
      text.split(" ").filter(_.nonEmpty).foreach { t =>
        val h = md5hex("fh#" + t)
        val dim = Integer.parseInt(h.substring(31, 32), 16)
        cells(dim) += (if ("13579bdf".contains(h(30))) 1L else -1L)
      }
      val (counts, ssq, emb) = got(id)
      assert(counts == cells.toSeq, s"doc $id cells")
      val wantSsq = cells.map(x => x * x).sum
      assert(ssq == wantSsq, s"doc $id ssq")
      if (wantSsq > 0) {
        val norm = math.sqrt(wantSsq.toDouble)
        emb.zip(cells).foreach { case (e, c) =>
          assert(e.doubleValue == c.toDouble / norm, s"doc $id element") }
        val n2 = emb.map(e => e.doubleValue * e.doubleValue).sum
        assert(math.abs(n2 - 1.0) < 1e-12, s"doc $id norm² $n2")
      } else emb.foreach(e => assert(e == null, s"doc $id null vector"))
    }

    // ── the SEARCH half: sim_hash_embed_topk's neighbors must be the
    // brute-force cosine top-3 over the same cell vectors, ties on id
    val topk = SparkEntry.queries("sim_hash_embed_topk")(
        spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4)))
    val cellsOf = got.view.mapValues(_._1).toMap
    val live = got.filter(_._2._2 > 0).keySet
    val wantTop = live.filter(_ < 5).toSeq.sorted.flatMap { q =>
      val qc = cellsOf(q)
      val scored = (live - q).toSeq.map { n =>
        val dot = qc.zip(cellsOf(n)).map { case (a, b) => a * b }.sum
        val cos = dot.toDouble /
          math.sqrt((got(q)._2 * got(n)._2).toDouble)
        (n, dot, cos)
      }.sortBy { case (n, _, cos) => (-cos, n) }.take(3)
      scored.zipWithIndex.map { case ((n, dot, cos), i) =>
        (q, (i + 1).toLong, n, dot, cos) }
    }
    assert(topk.toSeq == wantTop, "top-3 neighbor set diverges")
    // neighbor lists are cosine-sorted and self-free
    topk.foreach { case (q, _, n, _, cos) =>
      assert(n != q && cos <= 1.0 + 1e-12, s"($q,$n) cosine $cos") }
  }

  test("txt_rouge2 ≡ exact best-match replay over distinct bigram sets") {
    val got = SparkEntry.queries("txt_rouge2")(spark, Sf001).collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.nonEmpty)
    def md5hex(s: String) =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val docs = Tables.documents(spark, Sf001)
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
      .filter(_._2.length >= 2)
      .map { case (id, t) =>
        (id, t.sliding(2).map(_.mkString(" ")).toSet)
      }
    val (ev, tr) = docs.partition { case (id, _) =>
      md5hex(s"eval#$id").substring(0, 2) < "10"
    }
    ev.foreach { case (eid, esh) =>
      val overlaps = tr.map { case (tid, tsh) => (tid, (esh & tsh).size) }
        .filter(_._2 > 0)
      if (overlaps.isEmpty) assert(!got.contains(eid))
      else {
        val (bt, shared) = overlaps.minBy { case (tid, n) => (-n, tid) }
        val (gbt, gn, gshared, gppm) = got(eid)
        assert(gbt == bt && gn == esh.size.toLong &&
          gshared == shared.toLong, s"eval $eid")
        assert(gppm == 1000000L * shared / esh.size)
        assert(gshared <= gn)
      }
    }
  }

  test("txt_trigram_topk ≡ exact replay; df ≤ tf and the cut is the " +
      "true frequency order") {
    val got = SparkEntry.queries("txt_trigram_topk")(spark, Sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length == 30)
    val docs = Tables.documents(spark, Sf001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
      .filter(_._2.length >= 3)
    val all = docs.flatMap { case (id, t) =>
      t.sliding(3).map(w => (id, w.mkString(" "))) }
    val want = all.groupBy(_._2).map { case (g, xs) =>
      (g, xs.length.toLong, xs.map(_._1).distinct.length.toLong) }
      .toSeq.sortBy(x => (-x._2, x._1)).take(30)
    assert(got.toSeq == want, "trigram ledger diverges")
    got.foreach { case (g, tf, df) => assert(df <= tf && df >= 1, g) }
  }

  test("txt_bpe_fertility: language cut conserves the compression " +
      "ledger's corpus totals; fertility bounded by [1, chars/word]") {
    val f = SparkEntry.queries("txt_bpe_fertility")(spark, Sf001).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getDouble(5)))
    assert(f.nonEmpty)
    val c = SparkEntry.queries("txt_bpe_compression")(spark, Sf001)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    // Σ_lang == Σ_len-bucket on every exact column (both partitions of
    // the same weighted vocabulary)
    assert(f.map(_._2).sum == c.map(_._1).sum, "n_words")
    assert(f.map(_._3).sum == c.map(_._2).sum, "n_chars")
    assert(f.map(_._4).sum == c.map(_._3).sum, "n_tokens")
    f.foreach { case (lang, w, ch, tk, fert, cpt) =>
      assert(fert >= 1.0 && tk >= w && tk <= ch,
        s"$lang fertility bounds: w=$w ch=$ch tk=$tk")
      assert(fert == tk.toDouble / w && cpt == ch.toDouble / tk, lang)
    }
  }

  test("txt_line_dedup ≡ exact replay: global first-occurrence chunk " +
      "survival, reassembly order, and mass conservation") {
    val got = SparkEntry.queries("txt_line_dedup")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).toSeq
    val docs = Tables.documents(spark, Sf001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
      .sortBy(_._1)
    val chunks = docs.flatMap { case (id, t) =>
      t.grouped(8).zipWithIndex.map { case (c, i) =>
        (id, i.toLong, c.mkString(" ")) } }
    val firstKey = chunks.groupBy(_._3)
      .map { case (c, xs) => c -> xs.map(x => x._1 * 1000 + x._2).min }
    val want = docs.map { case (id, t) =>
      val mine = chunks.filter(_._1 == id)
      val kept = mine.filter(x => firstKey(x._3) == id * 1000 + x._2)
      (id, mine.length.toLong, kept.length.toLong,
        kept.sortBy(_._2).map(_._3).mkString(" "))
    }.toSeq
    assert(got == want, "line-dedup replay diverges")
    // duplicate mass exists in the fixture and is actually removed
    val removed = got.map(r => r._2 - r._3).sum
    assert(removed > 0, "fixture has no duplicate chunks — vacuous test")
    // every surviving chunk instance is the unique global first
    assert(got.map(_._3).sum == chunks.map(_._3).distinct.length)
  }

  test("txt_kn_continuation: counts are the distinct-left-context " +
      "sizes; ppm shares sum to ~1e6; total_types constant") {
    val got = SparkEntry.queries("txt_kn_continuation")(spark, Sf001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, Sf001).select("text")
      .collect().map(_.getString(0).split(" ").filter(_.nonEmpty).toSeq)
      .filter(_.length >= 2)
    val types = docs.flatMap(t => t.sliding(2).map(w => (w(0), w(1))))
      .distinct
    val cont = types.groupBy(_._2).map { case (w, xs) => w -> xs.length }
    assert(got.map(_._3).distinct.toSeq == Seq(types.length.toLong))
    got.foreach { case (tok, c, tt, ppm) =>
      assert(c == cont(tok).toLong, s"cont($tok)")
      assert(ppm == math.floor(c * 1000000.0 / tt).toLong, tok)
    }
    // Σ cont over the vocab = total bigram types (a partition identity)
    assert(got.map(_._2).sum == types.length.toLong)
  }

  test("txt_df_spectrum: spectrum partitions the bigram vocabulary; " +
      "cumulative closes at the total with cum_ppm = 1e6") {
    val got = SparkEntry.queries("txt_df_spectrum")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(got.nonEmpty)
    val docs = Tables.documents(spark, Sf001).select("doc_id", "text")
      .collect().map(r => (r.getLong(0),
        r.getString(1).split(" ").filter(_.nonEmpty).toSeq))
      .filter(_._2.length >= 2)
    val df = docs.flatMap { case (id, t) =>
      t.sliding(2).map(w => (id, w.mkString(" "))) }
      .distinct.groupBy(_._2).map { case (_, xs) => xs.length.toLong }
    val want = df.groupBy(identity).map { case (d, xs) =>
      (d, xs.size.toLong) }.toSeq.sortBy(_._1)
    assert(got.map(x => (x._1, x._2)).toSeq == want)
    // cumulative column is the running sum and closes exactly
    var run = 0L
    got.foreach { case (_, n, cum, _) => run += n; assert(cum == run) }
    assert(got.last._3 == df.size.toLong && got.last._4 == 1000000L)
    assert(got.map(_._3).sliding(2).forall(p =>
      p.length < 2 || p(0) < p(1)), "cumulative must be increasing")
  }

  test("txt_ccnet_bucket: exact per-language tertiles, score-monotone " +
      "buckets, and score_q consistent with txt_lm_score") {
    val got = SparkEntry.queries("txt_ccnet_bucket")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3)))
    val lm = SparkEntry.queries("txt_lm_score")(spark, Sf001)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(got.length == lm.size, "every scored doc gets a bucket")
    got.groupBy(_._2).foreach { case (lang, xs) =>
      val n = xs.length
      val sizes = xs.groupBy(_._4).view.mapValues(_.length).toMap
      assert(sizes.getOrElse("tail", 0) == n / 3, s"$lang tail size")
      assert(sizes.getOrElse("middle", 0) == 2 * n / 3 - n / 3,
        s"$lang middle size")
      assert(sizes.getOrElse("head", 0) == n - 2 * n / 3, s"$lang head")
      // bucket boundaries respect the score order (ties split by
      // doc_id, so boundaries may share a score — use >=)
      def scores(b: String) = xs.filter(_._4 == b).map(_._3)
      if (scores("head").nonEmpty && scores("middle").nonEmpty)
        assert(scores("head").min >= scores("middle").max - 0,
          s"$lang head/middle order") // ranks break ties upward
      if (scores("middle").nonEmpty && scores("tail").nonEmpty)
        assert(scores("middle").min >= scores("tail").max - 0,
          s"$lang middle/tail order")
    }
    // score_q is floor(avg_lp·10⁹) up to the floor's unit interval
    got.foreach { case (id, _, sq, _) =>
      val s = lm(id) * 1e9
      assert(sq <= s + 1e-3 && s < sq + 1 + 1e-3, s"doc $id score_q")
    }
  }
}
