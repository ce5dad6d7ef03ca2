package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Deterministic cardinality sketching (distinct users per event type
  * via K-Minimum-Values). This module holds the window-form twin that
  * the DuckDB oracle can check EXACTLY — KMV, unlike HLL, is a pure
  * function of the hash values, so both engines compute the identical
  * estimate. The production aggregation form (bounded O(k) state,
  * map-side-combinable merge) is functions/KmvSketch; SketchSpec pins
  * the two equal to the last bit.
  */
object Sketches {

  private val K = 32
  private val Norm = 4.503599627370496e15 // 16^13 = 2^52, exact double

  /** DuckDB: first-13-hex-chars value of `h` as a BIGINT polynomial
    * (mirror of Spark's conv(substring(h,1,13),16,10)). */
  private def hex13Sql(h: String): String =
    (1 to 13).map { j =>
      val w = 1L << (4 * (13 - j))
      s"(strpos('0123456789abcdef', substr($h, $j, 1)) - 1) * $w"
    }.mkString(" + ")

  /** evt_wau_sketch's oracle, optionally restricted to days CLOSED by
    * the final stream watermark (max event time, delay 0, floored to
    * ms — the StreamWau contract): the shared text keeps the batch
    * query and its driver-visible streaming feed (stream_wau_feed)
    * oracling the same computation. */
  private def wauSketchSql(closedOnly: Boolean): String = {
    val closed = if (closedOnly)
      """
        |  AND epoch_us(CAST(m.day AS TIMESTAMP)) + 86400000000
        |        <= (SELECT (MAX(epoch_us(CAST(ts AS TIMESTAMP))) // 1000)
        |            * 1000 FROM events)""".stripMargin
    else ""
    s"""WITH ud AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
       |), hh AS (
       |  SELECT day, md5(CAST(user_id AS VARCHAR)) AS h FROM ud
       |), sk AS (
       |  SELECT day, h FROM (
       |    SELECT day, h, row_number() OVER (PARTITION BY day ORDER BY h) AS rn
       |    FROM hh) x
       |  WHERE rn <= $K
       |), contrib AS (
       |  SELECT DISTINCT sk.day + CAST(i AS INTEGER) AS day, h
       |  FROM sk, range(0, 7) r(i)
       |), m AS (
       |  SELECT day, h,
       |         row_number() OVER (PARTITION BY day ORDER BY h) AS rn,
       |         COUNT(*) OVER (PARTITION BY day) AS n_union
       |  FROM contrib
       |)
       |SELECT m.day, n_union,
       |       CASE WHEN n_union < $K THEN CAST(n_union AS DOUBLE)
       |            ELSE ${K - 1}.0 / (CAST(${hex13Sql("h")} AS DOUBLE)
       |                               / 4503599627370496.0) END AS wau_sketch
       |FROM m
       |JOIN (SELECT DISTINCT day FROM ud) ad ON ad.day = m.day
       |WHERE rn = least($K, n_union)
       |  AND m.day >= (SELECT MIN(day) FROM ud) + 6$closed
       |ORDER BY m.day""".stripMargin
  }

  val queries: Seq[Q] = Seq(

    // Distinct users per event type, exact AND KMV-estimated: the k-th
    // smallest md5 per group yields est = (k−1)/u_k. A group with
    // fewer than k distinct members takes the sketch's exact path
    // (KmvSketch.finish returns the count when the buffer never
    // filled) — same branch here, via rn = min(k, n). The window form
    // sorts each group's full distinct set — the checkable twin; the
    // scale form is the bounded-state aggregator (see module doc).
    Q("sketch_kmv_distinct",
      s"""WITH d AS (
         |  SELECT DISTINCT event_type, user_id FROM events
         |), h AS (
         |  SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM d
         |), r AS (
         |  SELECT event_type, h,
         |         row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn,
         |         COUNT(*) OVER (PARTITION BY event_type) AS n_exact
         |  FROM h
         |)
         |SELECT event_type, n_exact,
         |       CASE WHEN n_exact < $K THEN CAST(n_exact AS DOUBLE)
         |            ELSE ${K - 1}.0 / (CAST(${hex13Sql("h")} AS DOUBLE)
         |                               / 4503599627370496.0) END AS kmv_est
         |FROM r WHERE rn = least($K, n_exact)
         |ORDER BY event_type""".stripMargin) { (s, d) =>
      val h = Tables.events(s, d)
        .select("event_type", "user_id").distinct()
        .select(col("event_type"),
          md5(col("user_id").cast("string")).as("h"))
      val w = Window.partitionBy("event_type").orderBy("h")
      val wAll = Window.partitionBy("event_type")
      h.select(col("event_type"), col("h"),
          row_number().over(w).as("rn"),
          count(lit(1)).over(wAll).as("n_exact"))
        .filter(col("rn") === least(lit(K), col("n_exact")))
        .select(col("event_type"), col("n_exact"),
          when(col("n_exact") < K, col("n_exact").cast("double"))
            .otherwise(lit((K - 1).toDouble) /
              (conv(substring(col("h"), 1, 13), 16, 10).cast("double")
                / lit(Norm))).as("kmv_est"))
        .orderBy("event_type")
    },

    // ── sketch-backed WAU (mergeable engagement rollup) ────────────────

    // Trailing-7-day active users from ONE bounded sketch per day — the
    // 100 TB form evt_dau_wau's comment promises: rolling DISTINCT does
    // not decompose over a window frame, but a KMV sketch does (bottom-k
    // of a union = bottom-k of the per-day bottom-k's), so each day
    // keeps k=32 hashes, each day's sketch CONTRIBUTES to the 7 windows
    // it falls inside (the same bounded ×7 explode as the exact query —
    // but of ≤k rows per day, not of the user-day table), and one
    // per-day merge re-ranks the ≤7k union. State per day is O(k)
    // regardless of corpus; the shuffle carries sketches, not users.
    // KMV (not HLL) keeps it deterministic: the estimate is a pure
    // function of the md5 values, so DuckDB computes the IDENTICAL
    // number and this is hash-oracled exactly, while SketchSpec pins
    // the typed two-stage aggregator (KmvState → KmvUnion, the
    // map-side-combinable production form) bit-equal to this window
    // twin AND the estimate's relative error against the exact
    // evt_dau_wau. Days whose window reaches before the data start are
    // excluded, mirroring evt_dau_wau.
    Q("evt_wau_sketch", wauSketchSql(closedOnly = false)) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val hh = ud.select(col("day"),
        md5(col("user_id").cast("string")).as("h"))
      val wDay = Window.partitionBy("day").orderBy("h")
      val sk = hh.withColumn("rn", row_number().over(wDay))
        .filter(col("rn") <= K).drop("rn")
      val contrib = sk
        .select(col("day").as("d0"), col("h"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .select(expr("date_add(d0, i)").as("day"), col("h")).distinct()
      val m = contrib
        .withColumn("rn", row_number().over(Window.partitionBy("day").orderBy("h")))
        .withColumn("n_union", count(lit(1)).over(Window.partitionBy("day")))
      val minDay = ud.agg(min("day").as("min_day"))
      m.filter(col("rn") === least(lit(K), col("n_union")))
        .join(ud.select("day").distinct(), Seq("day"))
        .join(broadcast(minDay))
        .filter(col("day") >= expr("date_add(min_day, 6)"))
        .select(col("day"), col("n_union"),
          when(col("n_union") < K, col("n_union").cast("double"))
            .otherwise(lit((K - 1).toDouble) /
              (conv(substring(col("h"), 1, 13), 16, 10).cast("double")
                / lit(Norm))).as("wau_sketch"))
        .orderBy("day")
    },

    // ── streaming WAU feed, driver-visible (§2.10 in the oracle) ───────

    // StreamWau's AvailableNow emissions (one KMV sketch per day + a
    // ≤7-sketch ring in GroupState) materialized and oracled against
    // the INDEPENDENT batch computation restricted to watermark-closed
    // days — the third driver-visible streaming row (after
    // stream_cdc_feed / stream_expectations_feed). StreamWauSpec
    // already pins stream ≡ batch in-JVM; this re-proves it per round
    // through the DuckDB hash gate. Closure rule mirrored exactly: the
    // final watermark is max event time (delay 0) FLOORED TO MS (Spark
    // watermarks are ms-granular), and a day is closed iff its end is
    // at-or-before it.
    Q("stream_wau_feed", wauSketchSql(closedOnly = true)) { (s, d) =>
      graft.streaming.StreamWau
        .runAvailableNow(s, d, "stream_wau_feed_sink")
        .select(to_date(col("day")).as("day"), col("n_union"),
          col("wau_sketch"))
        .orderBy("day")
    },

    // ── HLL-register WAU (the element-wise-max merge path) ─────────────

    // The trailing-7-day WAU again, this time from DAILY HLL REGISTER
    // SETS merged by element-wise MAX — the merge evt_wau_sketch's KMV
    // ring cannot do in O(1) state per bucket. KMV merges by re-ranking
    // the unioned bottom-k's (O(7k log k) per output day); HLL registers
    // fold with GREATEST, so at 100 TB the 7-day window is ONE max-agg
    // over (day+i, bucket) cells — the same bounded ×7 contribution
    // explode, but of 64 integers per day instead of k hashes, and the
    // whole window merge is map-side combinable. Same determinism route
    // as sketch_hll: md5 → 52-bit value, bucket = low 6 bits, rho via
    // the len(bin(·)) identity, harmonic denominator as the exact
    // scaled integer Σ2^(50−M_j) < 2⁶⁴ (rule-10 safe channel), ONE
    // pinned double expression for α_64·m²/Σ. Warm-up cut and
    // active-day gating mirror evt_wau_sketch so the three WAU forms
    // (exact / KMV / HLL) are row-aligned.
    Q("evt_wau_hll",
      s"""WITH ud AS (
         |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
         |), rr AS (
         |  SELECT day, h52 % 64 AS b,
         |         CASE WHEN h52 // 64 = 0 THEN 47
         |              ELSE 47 - len(bin(h52 // 64)) END AS rho
         |  FROM (SELECT day,
         |               (${hex13Sql("md5(CAST(user_id AS VARCHAR))")}) AS h52
         |        FROM ud) hv
         |), contrib AS (
         |  SELECT rr.day + CAST(i AS INTEGER) AS day, b, MAX(rho) AS m
         |  FROM rr, range(0, 7) r(i)
         |  GROUP BY 1, 2
         |), grid AS (
         |  SELECT ad.day, g.b
         |  FROM (SELECT DISTINCT day FROM ud) ad,
         |       (SELECT unnest(range(0, 64)) AS b) g
         |), reg AS (
         |  SELECT grid.day, grid.b, COALESCE(contrib.m, 0) AS m
         |  FROM grid LEFT JOIN contrib
         |    ON contrib.day = grid.day AND contrib.b = grid.b
         |)
         |SELECT day,
         |       CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS v_zero,
         |       CAST(SUM(CAST(1 AS BIGINT) << (50 - m)) AS BIGINT)
         |         AS s_scaled,
         |       0.709e0 * 4096e0 * 1125899906842624e0
         |         / CAST(CAST(SUM(CAST(1 AS BIGINT) << (50 - m)) AS BIGINT)
         |                AS DOUBLE) AS wau_hll
         |FROM reg
         |WHERE day >= (SELECT MIN(day) FROM ud) + 6
         |GROUP BY day ORDER BY day""".stripMargin) { (s, d) =>
      val ud = Tables.events(s, d)
        .select(col("user_id"), col("ts").cast("date").as("day")).distinct()
      val rr = ud.select(col("day"),
          conv(substring(md5(col("user_id").cast("string")), 1, 13), 16, 10)
            .cast("long").as("h52"))
        .select(col("day"), (col("h52") % 64).as("b"),
          when(expr("h52 div 64") === 0, lit(47))
            .otherwise(lit(47) - length(bin(expr("h52 div 64")))).as("rho"))
      val contrib = rr
        .select(col("day").as("d0"), col("b"), col("rho"),
          explode(sequence(lit(0), lit(6))).as("i"))
        .groupBy(expr("date_add(d0, i)").as("day"), col("b"))
        .agg(max("rho").as("m"))
      val grid = ud.select("day").distinct()
        .crossJoin(broadcast(s.range(0, 64).select(col("id").as("b"))))
      val reg = grid.join(contrib, Seq("day", "b"), "left")
        .select(col("day"), coalesce(col("m"), lit(0)).as("m"))
      val minDay = ud.agg(min("day").as("min_day"))
      reg.groupBy("day")
        .agg(sum(when(col("m") === 0, 1).otherwise(0)).cast("long")
            .as("v_zero"),
          sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - m AS INT))"))
            .as("s_scaled"))
        .join(broadcast(minDay))
        .filter(col("day") >= expr("date_add(min_day, 6)"))
        .select(col("day"), col("v_zero"), col("s_scaled"),
          (lit(0.709) * lit(4096.0) * lit(1125899906842624.0)
            / col("s_scaled").cast("double")).as("wau_hll"))
        .orderBy("day")
    },

    // ── KMV set intersection (week-over-week returning users) ─────────

    // |active(week w) ∩ active(week w+1)| for every consecutive week
    // pair — the returning-user count behind every retention dashboard
    // — exact AND estimated from bounded sketches. Intersection, like
    // rolling distinct, does not decompose: you cannot merge two HLLs
    // into an intersection. KMV can: the bottom-k of A ∪ B is
    // computable from the two bottom-k's, and each surviving hash is
    // checkable for membership in either side's sketch, so
    // est = |{h ∈ sk(A∪B) : h ∈ A ∧ h ∈ B}| · est(|A∪B|) / k — the
    // standard KMV/theta-sketch intersection. At 100 TB each week
    // keeps O(k) state (functions/KmvSketch is the aggregation form,
    // same hashes) and pairs join week×week — the shuffle carries
    // sketches, not users. KMV's determinism makes the estimate a pure
    // function of the md5 values, so DuckDB computes the IDENTICAL
    // number and the whole query is hash-oracled exactly (the
    // sketch_kmv_distinct precedent); when the union never fills the
    // sketch the estimate collapses to the exact count by
    // construction (c·n/n = c, exact in IEEE). The exact columns ride
    // along as the accuracy reference; SketchSpec pins the error
    // against them. Each (week, user) row contributes to pair w (the
    // left side) and pair w−1 (the right side) — the bounded ×2
    // explode analog of evt_wau_sketch's ×7.
    Q("sketch_kmv_intersect", {
      val wk = "date_diff('day', DATE '1970-01-01', CAST(ts AS DATE)) // 7"
      s"""WITH wu AS (
         |  SELECT DISTINCT $wk AS wk, user_id FROM events
         |), c AS (
         |  SELECT wk AS p, md5(CAST(user_id AS VARCHAR)) AS h,
         |         1 AS a, 0 AS b
         |  FROM wu
         |  UNION ALL
         |  SELECT wk - 1 AS p, md5(CAST(user_id AS VARCHAR)) AS h, 0, 1
         |  FROM wu
         |), g AS (
         |  SELECT p, h, MAX(a) AS in_a, MAX(b) AS in_b FROM c GROUP BY p, h
         |), r AS (
         |  SELECT p, h, in_a, in_b,
         |         row_number() OVER (PARTITION BY p ORDER BY h) AS rn
         |  FROM g
         |), m AS (
         |  SELECT p, CAST(COUNT(*) AS BIGINT) AS n_union_exact,
         |         CAST(SUM(in_a) AS BIGINT) AS n_a,
         |         CAST(SUM(in_b) AS BIGINT) AS n_b,
         |         CAST(SUM(CASE WHEN in_a = 1 AND in_b = 1
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS n_int_exact,
         |         CAST(SUM(CASE WHEN rn <= $K AND in_a = 1 AND in_b = 1
         |                       THEN 1 ELSE 0 END) AS BIGINT) AS sk_common,
         |         MAX(CASE WHEN rn = $K THEN h END) AS u_k
         |  FROM r GROUP BY p
         |)
         |SELECT CAST(p AS BIGINT) AS week, n_a, n_b, n_int_exact,
         |       n_union_exact, sk_common,
         |       CAST(sk_common AS DOUBLE)
         |         * (CASE WHEN n_union_exact < $K
         |                 THEN CAST(n_union_exact AS DOUBLE)
         |                 ELSE ${K - 1}.0 / (CAST(${hex13Sql("u_k")} AS DOUBLE)
         |                                    / 4503599627370496.0) END)
         |         / LEAST($K, n_union_exact) AS int_est
         |FROM m WHERE n_a > 0 AND n_b > 0
         |ORDER BY week""".stripMargin }) { (s, d) =>
      val wu = Tables.events(s, d)
        .select(expr("datediff(cast(ts as date), DATE'1970-01-01') div 7")
          .as("wk"), col("user_id")).distinct()
      val hh = wu.select(col("wk"),
        md5(col("user_id").cast("string")).as("h"))
      val c = hh.select(col("wk").as("p"), col("h"),
          lit(1).as("a"), lit(0).as("b"))
        .unionByName(hh.select((col("wk") - 1).as("p"), col("h"),
          lit(0).as("a"), lit(1).as("b")))
      val g = c.groupBy("p", "h")
        .agg(max("a").as("in_a"), max("b").as("in_b"))
      val r = g.withColumn("rn",
        row_number().over(Window.partitionBy("p").orderBy("h")))
      val m = r.groupBy("p").agg(
        count(lit(1)).as("n_union_exact"),
        sum("in_a").as("n_a"), sum("in_b").as("n_b"),
        sum(when(col("in_a") === 1 && col("in_b") === 1, 1).otherwise(0))
          .as("n_int_exact"),
        sum(when(col("rn") <= K && col("in_a") === 1 && col("in_b") === 1, 1)
          .otherwise(0)).as("sk_common"),
        max(when(col("rn") === K, col("h"))).as("u_k"))
      m.filter(col("n_a") > 0 && col("n_b") > 0)
        .select(col("p").cast("long").as("week"),
          col("n_a"), col("n_b"), col("n_int_exact"),
          col("n_union_exact"), col("sk_common"),
          (col("sk_common").cast("double")
            * when(col("n_union_exact") < K,
                col("n_union_exact").cast("double"))
              .otherwise(lit((K - 1).toDouble) /
                (conv(substring(col("u_k"), 1, 13), 16, 10).cast("double")
                  / lit(Norm)))
            / least(lit(K), col("n_union_exact"))).as("int_est"))
        .orderBy("week")
    },

    // ── bottom-k quantile sketch ───────────────────────────────────────

    // p50/p90 of `value` per event type, exact AND estimated from the
    // bottom-64-by-hash sample (functions/BottomKSample is the bounded
    // O(k)-state production form; this window twin is the exactly
    // oracle-checkable one). Rank rule: the ⌈q·n⌉-th value by
    // (value, event_id) — pure selection, no interpolation for the
    // engines to disagree on. The exact columns sort each full group
    // (the thing the sketch avoids at scale); they ride along here as
    // the accuracy reference.
    Q("sketch_quantile", {
      val SK = 64
      def pick(alias: String, rnCol: String, q: String, n: String) =
        s"MAX(CASE WHEN $rnCol = CAST(ceil($q * $n) AS BIGINT) THEN value END) AS $alias"
      s"""WITH h AS (
         |  SELECT event_type, event_id, value,
         |         md5(CAST(event_id AS VARCHAR)) AS h
         |  FROM events
         |), r AS (
         |  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY h) AS hrk,
         |         COUNT(*) OVER (PARTITION BY event_type) AS n
         |  FROM h
         |), ex AS (
         |  SELECT event_type, n,
         |         ${pick("p50_exact", "vrk", "0.5", "n")},
         |         ${pick("p90_exact", "vrk", "0.9", "n")}
         |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
         |                  ORDER BY value, event_id) AS vrk FROM r) t
         |  GROUP BY event_type, n
         |), sm AS (
         |  SELECT event_type,
         |         ${pick("p50_est", "srk", "0.5", s"LEAST(n, $SK)")},
         |         ${pick("p90_est", "srk", "0.9", s"LEAST(n, $SK)")}
         |  FROM (SELECT *, row_number() OVER (PARTITION BY event_type
         |                  ORDER BY value, event_id) AS srk
         |        FROM r WHERE hrk <= $SK) t
         |  GROUP BY event_type
         |)
         |SELECT ex.event_type, ex.n, p50_exact, p90_exact, p50_est, p90_est
         |FROM ex JOIN sm ON ex.event_type = sm.event_type
         |ORDER BY 1""".stripMargin }) { (s, d) =>
      val SK = 64
      val h = Tables.events(s, d).select(col("event_type"), col("event_id"),
        col("value"), md5(col("event_id").cast("string")).as("h"))
      val wH = Window.partitionBy("event_type").orderBy("h")
      val wAll = Window.partitionBy("event_type")
      val wV = Window.partitionBy("event_type").orderBy("value", "event_id")
      val r = h.withColumn("hrk", row_number().over(wH))
        .withColumn("n", count(lit(1)).over(wAll))
      def pick(rn: org.apache.spark.sql.Column, q: Double,
          n: org.apache.spark.sql.Column) =
        max(when(rn === ceil(lit(q) * n).cast("long"), col("value")))
      val ex = r.withColumn("vrk", row_number().over(wV))
        .groupBy("event_type", "n")
        .agg(pick(col("vrk"), 0.5, col("n")).as("p50_exact"),
          pick(col("vrk"), 0.9, col("n")).as("p90_exact"))
      val sm = r.filter(col("hrk") <= SK)
        .withColumn("srk", row_number().over(wV))
        .groupBy("event_type")
        .agg(pick(col("srk"), 0.5, least(col("n"), lit(SK))).as("p50_est"),
          pick(col("srk"), 0.9, least(col("n"), lit(SK))).as("p90_est"))
      ex.join(sm, Seq("event_type"))
        .select("event_type", "n", "p50_exact", "p90_exact",
          "p50_est", "p90_est")
        .orderBy("event_type")
    },

    // ── Count-Min point-frequency sketch ───────────────────────────────

    // Completes the sketch triad: KMV answers "how many DISTINCT",
    // Misra-Gries answers "which keys are HEAVY", Count-Min (Cormode &
    // Muthukrishnan, J.Alg'05) answers "how often is THIS key" for an
    // arbitrary key, in O(d·w) space with a one-sided error: est ≥
    // exact always, E[overcount] ≤ N/w per row, min over d rows. Like
    // the KMV choice, CMS here is fully DETERMINISTIC — buckets are
    // salted-md5 of the key, so both engines place every event in the
    // same cell and the driver hash-checks the whole estimate matrix
    // (approx_count_distinct-style randomized sketches cannot give
    // that). d=4 rows × w=64 buckets over event user_ids; probe set =
    // the 20 most active users (exact count, deterministic tie-break),
    // output exact vs estimate vs overcount — the accuracy ledger an
    // operator tunes w against. Scale shape: the counter matrix is ONE
    // map-side-combined aggregate into ≤ d·w = 256 cells (counters are
    // sums ⇒ partials merge by addition — the same mergeability law
    // agg_incremental_merge proves for KMV states); probes join the
    // 256-row matrix as a broadcast; the top-20 selection is a
    // TakeOrdered, not a global sort. SketchSpec pins est ≥ exact on
    // every key and counter mergeability across an epoch split.
    Q("sketch_cms", {
      s"""WITH r4 AS (SELECT * FROM (VALUES (0), (1), (2), (3)) t(r)),
         |hb0 AS (
         |  SELECT e.user_id, r4.r,
         |         md5(concat('cms', CAST(r4.r AS VARCHAR), '#',
         |                    CAST(e.user_id AS VARCHAR))) AS hh
         |  FROM events e CROSS JOIN r4
         |), hb AS (
         |  SELECT user_id, r, (${hex13Sql("hh")}) % 64 AS b FROM hb0
         |), cnt AS (
         |  SELECT r, b, CAST(COUNT(*) AS BIGINT) AS c FROM hb GROUP BY r, b
         |), ex AS (
         |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_exact
         |  FROM events GROUP BY user_id
         |), probe AS (
         |  SELECT user_id, n_exact FROM (
         |    SELECT *, row_number() OVER (ORDER BY n_exact DESC, user_id)
         |      AS rn FROM ex) x
         |  WHERE rn <= 20
         |), kb AS (
         |  SELECT DISTINCT user_id, r, b FROM hb
         |)
         |SELECT p.user_id, p.n_exact, MIN(c.c) AS cms_est,
         |       MIN(c.c) - p.n_exact AS overcount
         |FROM probe p
         |JOIN kb ON kb.user_id = p.user_id
         |JOIN cnt c ON c.r = kb.r AND c.b = kb.b
         |GROUP BY p.user_id, p.n_exact
         |ORDER BY n_exact DESC, p.user_id""".stripMargin
    }) { (s, d) =>
      val W = 64
      def bucket(r: Int, key: org.apache.spark.sql.Column) =
        conv(substring(md5(concat(lit(s"cms$r#"), key.cast("string"))),
          1, 13), 16, 10).cast("long") % W
      def rb(key: org.apache.spark.sql.Column) = explode(array(
        (0 to 3).map(r => struct(lit(r).as("r"),
          bucket(r, key).as("b"))): _*))
      val ev = Tables.events(s, d).select(col("user_id"))
      val cnt = ev.select(rb(col("user_id")).as("rb"))
        .select(col("rb.r").as("r"), col("rb.b").as("b"))
        .groupBy("r", "b").agg(count(lit(1)).as("c"))
      val probe = ev.groupBy("user_id").agg(count(lit(1)).as("n_exact"))
        .orderBy(col("n_exact").desc, col("user_id")).limit(20)
      probe
        .select(col("user_id"), col("n_exact"), rb(col("user_id")).as("rb"))
        .select(col("user_id"), col("n_exact"),
          col("rb.r").as("r"), col("rb.b").as("b"))
        .join(broadcast(cnt), Seq("r", "b"))
        .groupBy("user_id", "n_exact").agg(min("c").as("cms_est"))
        .select(col("user_id"), col("n_exact"), col("cms_est"),
          (col("cms_est") - col("n_exact")).as("overcount"))
        .orderBy(col("n_exact").desc, col("user_id"))
    },

    // ── HyperLogLog register sketch ────────────────────────────────────

    // The industry-standard cardinality sketch (Flajolet et al.,
    // AofA'07) beside the KMV twin: where KMV keeps the k smallest
    // hashes (order statistics), HLL keeps ONE number per bucket — the
    // max leading-zero run of the hashes landing there — so the state
    // is m=64 small integers and the merge is element-wise MAX (the
    // cheapest mergeable state there is; SketchSpec pins epoch-split
    // registers folding by GREATEST into the full-corpus registers
    // bit-for-bit). Everything stays deterministic and hash-oracle-able
    // the way this module requires: registers are exact integers
    // (md5 → 52-bit value, bucket = low 6 bits, rho = leading-zero
    // count of the remaining 46-bit field via the length-of-bin
    // identity — len(bin(x)) = floor(log2 x)+1 exactly, as a STRING
    // length, in both engines), the harmonic-mean denominator
    // Σ 2^(−M_j) is carried as the exact scaled integer Σ 2^(50−M_j)
    // (≤ 64·2^50 = 2^56 — BIGINT→double below 2^64 is the NOTES rule-10
    // safe channel), and the final α_64·m²/Σ is ONE identical
    // double-literal expression on both sides. The ln-based
    // linear-counting small-range branch is deliberately NOT applied
    // (libm ulp differences across engines break hash parity — the
    // v_zero column ships so a consumer can apply it); α_64 = 0.709 is
    // Flajolet's published constant for m = 64. Scale shape: one
    // map-side-combined MAX aggregate into ≤ groups×64 cells; the
    // 64-row grid join is a broadcast; nothing corpus-scale shuffles
    // past the distinct.
    Q("sketch_hll", {
      s"""WITH d AS (
         |  SELECT DISTINCT event_type, user_id FROM events
         |), hv AS (
         |  SELECT event_type,
         |         (${hex13Sql("md5(CAST(user_id AS VARCHAR))")}) AS h52
         |  FROM d
         |), rr AS (
         |  SELECT event_type, h52 % 64 AS b,
         |         CASE WHEN h52 // 64 = 0 THEN 47
         |              ELSE 47 - len(bin(h52 // 64)) END AS rho
         |  FROM hv
         |), reg0 AS (
         |  SELECT event_type, b, MAX(rho) AS m FROM rr GROUP BY 1, 2
         |), grid AS (
         |  SELECT t.event_type, g.b
         |  FROM (SELECT DISTINCT event_type FROM d) t,
         |       (SELECT unnest(range(0, 64)) AS b) g
         |), reg AS (
         |  SELECT grid.event_type, grid.b, COALESCE(reg0.m, 0) AS m
         |  FROM grid LEFT JOIN reg0
         |    ON reg0.event_type = grid.event_type AND reg0.b = grid.b
         |), agg AS (
         |  SELECT event_type,
         |         CAST(SUM(CAST(1 AS BIGINT) << (50 - m)) AS BIGINT)
         |           AS s_scaled,
         |         CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS BIGINT)
         |           AS v_zero
         |  FROM reg GROUP BY 1
         |), ex AS (
         |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_exact
         |  FROM d GROUP BY 1
         |)
         |SELECT ex.event_type, ex.n_exact, agg.v_zero, agg.s_scaled,
         |       0.709e0 * 4096e0 * 1125899906842624e0
         |         / CAST(agg.s_scaled AS DOUBLE) AS hll_raw_est
         |FROM ex JOIN agg ON agg.event_type = ex.event_type
         |ORDER BY ex.event_type""".stripMargin
    }) { (s, d) =>
      val dd = Tables.events(s, d)
        .select("event_type", "user_id").distinct()
      val hv = dd.select(col("event_type"),
        conv(substring(md5(col("user_id").cast("string")), 1, 13), 16, 10)
          .cast("long").as("h52"))
      val rr = hv.select(col("event_type"), (col("h52") % 64).as("b"),
        when(expr("h52 div 64") === 0, lit(47))
          .otherwise(lit(47) - length(bin(expr("h52 div 64")))).as("rho"))
      val reg0 = rr.groupBy("event_type", "b").agg(max("rho").as("m"))
      val grid = dd.select("event_type").distinct()
        .crossJoin(broadcast(s.range(0, 64).select(col("id").as("b"))))
      val reg = grid.join(reg0, Seq("event_type", "b"), "left")
        .select(col("event_type"), coalesce(col("m"), lit(0)).as("m"))
      val agg = reg.groupBy("event_type")
        .agg(sum(expr("shiftleft(CAST(1 AS BIGINT), CAST(50 - m AS INT))"))
            .as("s_scaled"),
          sum(when(col("m") === 0, 1).otherwise(0)).cast("long").as("v_zero"))
      val ex = dd.groupBy("event_type").agg(count(lit(1)).as("n_exact"))
      ex.join(agg, Seq("event_type"))
        .select(col("event_type"), col("n_exact"), col("v_zero"),
          col("s_scaled"),
          (lit(0.709) * lit(4096.0) * lit(1125899906842624.0)
            / col("s_scaled").cast("double")).as("hll_raw_est"))
        .orderBy("event_type")
    },

    // Incremental aggregate maintenance — the pattern that completes
    // the incrementality trio (dedup_incremental admits new docs
    // against the index, snk_merge folds row upserts): a per-day
    // orders rollup maintained from a MATERIALIZED base epoch plus a
    // new-arrivals delta epoch, where the epoch boundary cuts MID-DAY
    // (o_orderkey % 4), so per-day partials genuinely merge instead of
    // unioning disjoint days. Sums and counts add; distinct customers
    // CANNOT add — the KMV state can (bottom-k(A∪B) = bottom-k of the
    // merged bottom-ks, duplicate hashes deduped on insert), which is
    // the whole reason the sketch column exists in a 100 TB rollup.
    // Oracle = ONE full scan computing the identical day-level numbers
    // — the incremental path is correct iff it is indistinguishable
    // from recomputing the world, and the hash compare enforces that
    // to the last bit. At scale: base partials are read, never
    // recomputed; only the delta scans, and the merge shuffles O(k)
    // sketch state + two numbers per day.
    //
    // Execution path (reworked per VERDICT r7 #2): ONE untyped
    // DataFrame pipeline — groupBy(day, delta) computing the numeric
    // partials AND the udaf-registered KMV state in the SAME
    // aggregate, then groupBy(day) folding sums and KmvUnion — so the
    // plan is two hash-partial aggregations with zero typed seams. The
    // previous typed form (groupByKey → Kryo state → .map splitting a
    // concat_ws string key → second groupByKey → join back to the
    // numeric branch) serialized every row twice through
    // DeserializeToObject and shuffled the fact table once per branch;
    // PlanSpec now pins this plan object-seam-free and single-scan.
    Q("agg_incremental_merge",
      s"""WITH hh AS (
         |  SELECT CAST(o_orderdate AS DATE) AS day,
         |         md5(CAST(o_custkey AS VARCHAR)) AS h, o_totalprice
         |  FROM orders
         |), num AS (
         |  SELECT day,
         |         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DOUBLE) AS sales,
         |         COUNT(*) AS n_orders
         |  FROM hh GROUP BY day
         |), dh AS (
         |  SELECT DISTINCT day, h FROM hh
         |), m AS (
         |  SELECT day, h,
         |         row_number() OVER (PARTITION BY day ORDER BY h) AS rn,
         |         COUNT(*) OVER (PARTITION BY day) AS nd
         |  FROM dh
         |)
         |SELECT m.day, num.sales, num.n_orders,
         |       CASE WHEN nd < $K THEN CAST(nd AS DOUBLE)
         |            ELSE ${K - 1}.0 / (CAST(${hex13Sql("h")} AS DOUBLE)
         |                               / 4503599627370496.0) END AS est_customers
         |FROM m JOIN num ON num.day = m.day
         |WHERE rn = least($K, nd)
         |ORDER BY m.day""".stripMargin) { (s, d) =>
      import graft.functions.{KmvState, KmvUnion}
      val M = Tables.M
      val kmvState = udaf(KmvState, org.apache.spark.sql.Encoders.STRING)
      val kmvUnion = udaf(KmvUnion,
        org.apache.spark.sql.Encoders.kryo[List[String]])
      val ords = Tables.orders(s, d).select(
        to_date(col("o_orderdate")).as("day"),
        col("o_custkey").cast("string").as("cust"),
        col("o_totalprice"),
        (col("o_orderkey") % 4 === 0).as("delta"))
      // partials per (day, epoch) — numeric sums/counts AND the O(k)
      // KMV state in ONE aggregate (what the base epoch materializes) —
      // then the day-level merge: sums add, states KmvUnion
      ords.groupBy("day", "delta")
        .agg(sum(col("o_totalprice").cast(M)).as("psales"),
          count(lit(1)).as("pn"),
          kmvState(col("cust")).as("sk"))
        .groupBy("day")
        .agg(sum("psales").cast("double").as("sales"),
          sum("pn").as("n_orders"),
          kmvUnion(col("sk")).as("est_customers"))
        .select(col("day"), col("sales"), col("n_orders"),
          col("est_customers"))
        .orderBy("day")
    }
  )
}
