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
    Q("evt_wau_sketch",
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
         |  AND m.day >= (SELECT MIN(day) FROM ud) + 6
         |ORDER BY m.day""".stripMargin) { (s, d) =>
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
    }
  )
}
