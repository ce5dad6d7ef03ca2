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

  test("layout_bucket_join: bucketed-layout results ≡ the plain join " +
      "(layout changes the plan, never the answer)") {
    import org.apache.spark.sql.functions._
    val got = SparkEntry.queries("layout_bucket_join")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    val want = Tables.lineitem(spark, SparkSuite.Sf0001)
      .join(Tables.orders(spark, SparkSuite.Sf0001),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("l_orderkey", "o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(col("l_extendedprice").cast(Tables.M)).cast("double").as("rev"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        (r.getLong(2), r.getDouble(3))).toMap
    assert(got.nonEmpty && got == want,
      s"bucketed ≠ plain: ${got.size} vs ${want.size} groups")
  }

  test("layout_compaction: 16x fewer files, rows conserved — and the " +
      "counts are measured from input_file_name, not echoed back") {
    val rows = SparkEntry.queries("layout_compaction")(
      spark, SparkSuite.Sf0001).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val n = Tables.orders(spark, SparkSuite.Sf0001).count()
    assert(rows("1_small") == (64L, n))
    assert(rows("2_compacted") == (4L, n))
  }

  test("src_csv_quoted: embedded delimiter/quote/newline fields " +
      "round-trip the CSV writer+multiLine reader verbatim") {
    import org.apache.spark.sql.functions._
    // force the fixture + parse, then compare the parsed field set to
    // the directly-constructed one
    SparkEntry.queries("src_csv_quoted")(spark, SparkSuite.Sf0001).collect()
    val path = graft.LayoutCache.materialize("graft_csvq",
      SparkSuite.Sf0001, "documents")(_ =>
      fail("fixture should already be materialized"))
    val parsed = spark.read
      .schema("doc_id BIGINT, tricky STRING, lang STRING")
      .option("multiLine", "true").csv(path)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val want = Tables.documents(spark, SparkSuite.Sf0001)
      .select(col("doc_id"), concat(lit("v,\""),
        substring(col("text"), 1, 20), lit("\"\n"), col("lang")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(parsed == want, "CSV quoting did not round-trip")
    assert(want.values.forall(v =>
      v.contains(",") && v.contains("\"") && v.contains("\n")),
      "fixture lost its planted edge cases")
  }
}
