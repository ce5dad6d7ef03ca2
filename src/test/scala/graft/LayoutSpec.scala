package graft

/** The z-order locality claim, asserted as pruning behavior: per-block
  * min/max stats under a z-curve layout bound BOTH dimensions, so both
  * probes prune; a single-dimension sort prunes only its own dimension
  * and degenerates to a full scan on the other. */
class LayoutSpec extends SparkSuite {

  test("layout_zorder_prune: z-layout prunes both probes, " +
      "single-dim sort full-scans the other dimension") {
    val rows = SparkEntry.queries("layout_zorder_prune")(
      spark, SparkSuite.Sf001).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3))).toMap
    assert(rows.size == 4, s"want the 2×2 layout×probe matrix, got $rows")
    val nBlocks = rows.values.map(_._1).toSet
    assert(nBlocks.size == 1, s"layouts must block the same rows: $rows")
    val n = nBlocks.head
    // customer sort: perfect on its own dimension...
    val custOwn = rows(("cust_sort", "cust_100_160"))._2
    assert(custOwn < n / 4, s"cust sort should prune its own probe hard: $rows")
    // ...but NO pruning power on the date dimension
    assert(rows(("cust_sort", "day_300_400"))._2 == n,
      s"cust sort must full-scan the day probe: $rows")
    // z-order: strictly prunes BOTH dimensions
    assert(rows(("zorder", "cust_100_160"))._2 < n, s"z cust probe: $rows")
    assert(rows(("zorder", "day_300_400"))._2 < n, s"z day probe: $rows")
    // and the single-dim sort stays at least as good as z on its own
    // dimension (z trades per-dim optimality for both-dim coverage)
    assert(custOwn <= rows(("zorder", "cust_100_160"))._2, s"$rows")
  }
}
