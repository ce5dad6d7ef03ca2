package graft

import graft.streaming.StreamContamination

/** The streaming ingest gate must agree ROW-FOR-ROW with the batch
  * txt_contamination scan: same registry, same kernel, so streaming a
  * corpus through the drop-dir gate and scanning it after the fact are
  * the same judgement. */
class StreamContaminationSpec extends SparkSuite {

  test("stream gate ≡ batch txt_contamination on sf0.001") {
    val streamed = StreamContamination
      .runAvailableNow(spark, SparkSuite.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    val batch = SparkEntry.queries("txt_contamination")(
        spark, SparkSuite.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(_._1)
    assert(streamed.nonEmpty)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("contaminated docs exist and score inside (0, 1]") {
    val rows = StreamContamination
      .runAvailableNow(spark, SparkSuite.Sf0001)
      .collect().map(r => (r.getLong(2), r.getDouble(3)))
    // the shared-vocab fixture guarantees some cross-split bigrams
    assert(rows.exists(_._1 > 0))
    rows.foreach { case (hits, c) =>
      assert(c >= 0.0 && c <= 1.0 && (hits > 0) == (c > 0.0)) }
  }
}
