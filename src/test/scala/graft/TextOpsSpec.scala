package graft

import graft.SparkSuite.Sf001

/** Dedup-family semantics: exact dedup collapses planted clones, MinHash
  * bands recover planted near-duplicates, SimHash is stable. */
class TextOpsSpec extends SparkSuite {

  test("dedup_exact: every planted clone collapses onto its source") {
    val rows = SparkEntry.queries("dedup_exact")(spark, Sf001).collect()
    val byCopies = rows.groupBy(_.getLong(2))
    // 100 planted clones (doc_id%5=0 of 500) → 100 groups of 2, 400 of 1
    assert(byCopies(2L).length == 100)
    assert(byCopies(1L).length == 400)
    // survivor is always the original (min doc_id < 10000)
    assert(rows.forall(_.getLong(1) < 10000))
  }

  test("dedup_minhash: planted near-duplicates are found as candidates") {
    val pairs = SparkEntry.queries("dedup_minhash")(spark, Sf001)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // near-clones are doc_id → doc_id+10000 with a 2-token tail change;
    // at least 80% must share a MinHash band (2 bands × 2 hashes)
    val planted = (0 until 500 by 10).map(i => (i.toLong, (i + 10000).toLong))
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
}
