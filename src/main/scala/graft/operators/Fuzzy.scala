package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy string matching (entity resolution): typo-bearing records
  * resolved against a clean reference table by edit distance — the
  * data-cleaning join the reference performs by hand when it matches
  * free-typed spreadsheet labels against configured entity names
  * (/root/reference/src/config.ts entity lookup; the engine generalizes
  * the exact lookup to a bounded-edit-distance one).
  *
  * Scale design (100 TB): never a cross join, and never string-match
  * per ROW — resolve the string DICTIONARY:
  *
  *   1. Dedup-first. Both sides collapse to their distinct strings
  *     before any matching (clean names also precompute their min key,
  *     so the per-name argmin below is exactly the per-row argmin).
  *     Real corpora repeat labels massively; matching work must scale
  *     with the dictionary, not the row count. Measured here: 147 s →
  *     ~1 s at sf0.1 (20k rows over ~400 distinct names whose tiny
  *     shared vocabulary makes every bigram hot — the exact shape that
  *     melts a row-level gram join).
  *   2. PPJoin-style prefix filter over padded character bigrams on the
  *     dictionaries: one unit edit rewrites at most q = 2 padded-bigram
  *     positions, so edit distance ≤ d destroys at most d·q = 4
  *     DISTINCT bigrams of either side — |S(a) ∩ S(b)| ≥
  *     max(|S(a)|,|S(b)|) − 4. Under one global gram order (corpus
  *     frequency asc, gram asc — rarest first), any true pair must
  *     share a gram within both sides' first |S| − (|S| − 4) + 1 = 5
  *     grams, so each string indexes only its 5 rarest grams.
  *   3. Candidates pass the EXACT levenshtein ≤ 2 gate (codegen'd
  *     built-in; classic DP, identical in DuckDB), the winner per dirty
  *     string is a deterministic `min(struct(dist, key))` aggregate —
  *     no window — and the row table joins the finished resolution
  *     dictionary (unhinted: dictionary size decides broadcast vs
  *     shuffle at runtime via AQE).
  *
  * The DuckDB oracle is deliberately NOT a mirror of the blocking: it
  * exhaustively cross-joins the two string DICTIONARIES + argmin,
  * independently proving the gram-prefix blocking lossless on the whole
  * corpus (FuzzySpec repeats the proof in-JVM at sf0.001). Until r12 it
  * cross-joined the ROW tables — O(rows²) levenshtein calls (4·10¹⁰ at
  * sf1, a checker timeout); the dictionary form is the same lossless
  * proof (distance is a function of the NAME, and the per-row argmin
  * under (dist, key) equals the per-name argmin over (dist, min key)),
  * bit-identical at sf0.001/0.01/0.1 and 0.2 s at sf1.
  */
object Fuzzy {

  private def pad(c: Column): Column = concat(lit("#"), c, lit("#"))

  /** Distinct padded character bigrams, exploded to (id, g) rows.
    * array_distinct runs per row inside the scan stage — the distinct
    * never shuffles. */
  private def grams(df: DataFrame, id: String, name: String): DataFrame =
    df.select(col(id), explode(array_distinct(
      transform(sequence(lit(1), length(col(name)) + 1),
        i => pad(col(name)).substr(i, lit(2))))).as("g"))

  /** The 5 globally-rarest grams per string under (freq asc, gram asc);
    * grams absent from the reference corpus rank as freq 0 (they cannot
    * produce a match but keeping the order total keeps the lemma's
    * proof intact). */
  private def prefix(g: DataFrame, id: String, freq: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    g.join(broadcast(freq), Seq("g"), "left")
      .withColumn("f", coalesce(col("f"), lit(0L)))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col(id)).orderBy(col("f"), col("g"))))
      .filter(col("rn") <= 5)
      .select(col(id), col("g"))
  }

  /** Deterministic single-substitution typo: the character at 0-based
    * position (key % length) becomes 'q'. */
  private def typo(name: Column, key: Column): Column = {
    val pos = key % length(name)
    concat(name.substr(lit(1), pos.cast("int")), lit("q"),
      name.substr((pos + 2).cast("int"), length(name)))
  }

  val queries: Seq[Q] = Seq(

    Q("join_fuzzy_lookup",
      s"""WITH parts AS (SELECT p_partkey, p_name FROM part),
         |dirty AS (
         |  SELECT p_partkey AS dirty_id,
         |         concat(substr(p_name, 1, CAST(p_partkey % length(p_name) AS INTEGER)),
         |                'q',
         |                substr(p_name, CAST(p_partkey % length(p_name) + 2 AS INTEGER))) AS dirty_name
         |  FROM parts
         |), dnames AS (SELECT DISTINCT dirty_name FROM dirty),
         |cnames AS (SELECT p_name, MIN(p_partkey) AS ckey FROM parts GROUP BY p_name),
         |ver AS (
         |  SELECT d.dirty_name, c.ckey,
         |         CAST(levenshtein(d.dirty_name, c.p_name) AS BIGINT) AS lev_dist
         |  FROM dnames d CROSS JOIN cnames c
         |  WHERE levenshtein(d.dirty_name, c.p_name) <= 2
         |), best AS (
         |  SELECT dirty_name, ckey AS match_key, lev_dist FROM (
         |    SELECT ver.*, row_number() OVER (PARTITION BY dirty_name ORDER BY lev_dist, ckey) AS rn
         |    FROM ver) t
         |  WHERE rn = 1
         |)
         |SELECT d.dirty_id, b.match_key, b.lev_dist
         |FROM dirty d JOIN best b ON b.dirty_name = d.dirty_name
         |ORDER BY dirty_id""".stripMargin) { (s, d) =>
      val parts = Tables.part(s, d).select("p_partkey", "p_name")
      val dirty = parts.select(col("p_partkey").as("dirty_id"),
        typo(col("p_name"), col("p_partkey")).as("dirty_name"))
      // dictionaries: distinct strings only; clean names carry their
      // min key so per-name argmin == per-row argmin
      val cnames = parts.groupBy("p_name").agg(min(col("p_partkey")).as("ckey"))
      val dnames = dirty.select("dirty_name").distinct()
      val cg = grams(cnames, "p_name", "p_name")
      val dg = grams(dnames, "dirty_name", "dirty_name")
      val freq = cg.groupBy("g").agg(count(lit(1)).as("f"))
      val cand = prefix(dg, "dirty_name", freq)
        .join(prefix(cg, "p_name", freq), Seq("g"))
        .select("dirty_name", "p_name").distinct()
      val res = cand
        .join(cnames, Seq("p_name"))
        .select(col("dirty_name"), col("ckey"),
          levenshtein(col("dirty_name"), col("p_name")).cast("long").as("lev_dist"))
        .filter(col("lev_dist") <= 2)
        .groupBy("dirty_name")
        .agg(min(struct(col("lev_dist"), col("ckey"))).as("best"))
        .select(col("dirty_name"), col("best.ckey").as("match_key"),
          col("best.lev_dist").as("lev_dist"))
      dirty.join(res, Seq("dirty_name"))
        .select(col("dirty_id"), col("match_key"), col("lev_dist"))
        .orderBy("dirty_id")
    },

    // ── Fellegi–Sunter blocked record linkage ──────────────────────────

    // Probabilistic entity resolution (Fellegi & Sunter 1969) over a
    // dirty feed vs the clean customer registry: candidate pairs come
    // from TWO independent blocking passes (last-6-of-name; nation ×
    // balance band), each field comparison contributes a fixed integer
    // agreement/disagreement weight (the log-odds the F-S model fits —
    // fixed here so the whole decision is exact integer arithmetic),
    // and the summed score classifies match / possible / nonmatch.
    // join_fuzzy_lookup resolves STRINGS; this resolves RECORDS — the
    // multi-field evidence model is the operator.
    //
    // Dirty-feed perturbations (deterministic, FIXTURES.md convention;
    // one rule per row, %13 wins over %7):
    //   %13: name positions 13-15 → 'XYZ' (lev 3: name DISAGREES, and
    //        blocking pass A breaks — only pass B recovers the pair,
    //        which is the point of multi-pass blocking);
    //   %7:  name position 12 → 'X' (lev 1: fuzzy name agreement);
    //   %5:  segment → 'ZZZ' (disagrees);
    //   %3:  balance +5 cents (outside the ±2-cent tolerance).
    // Money compares in exact integer CENTS (floor(bal·100 + 0.5) —
    // identical in both engines; no decimal rounding mode in play).
    //
    // Weights: name exact +24 / lev≤2 +12 / else −8; segment +10/−5;
    // nation +6/−12; balance ±2¢ +8/−4. Classes: ≥33 match, ≥16
    // possible, else nonmatch (dropped). Every single-field error still
    // matches; name-destroyed rows land possible; cross-customer block
    // mates score ≤ −14 and drop.
    //
    // Scale shape: both blocking passes are equi-joins on bounded keys
    // (name suffix ≈ unique; nation×band bounded by balance range);
    // the pair-distinct and the two lookups back to the views are
    // pair-keyed hash joins; levenshtein runs on CANDIDATES only. At a
    // larger registry the band key narrows (finer cents bucket) — the
    // blocking key, not the plan, is the scale dial.
    Q("join_blocked_er",
      """WITH cl AS (
        |  SELECT c_custkey, c_name, c_nationkey, c_mktsegment,
        |         CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS cents
        |  FROM customer
        |), dirty AS (
        |  SELECT c_custkey + 500000 AS rid,
        |         CASE WHEN c_custkey % 13 = 0
        |                THEN concat(substr(c_name, 1, 12), 'XYZ', substr(c_name, 16))
        |              WHEN c_custkey % 7 = 0
        |                THEN concat(substr(c_name, 1, 11), 'X', substr(c_name, 13))
        |              ELSE c_name END AS d_name,
        |         c_nationkey AS d_nation,
        |         CASE WHEN c_custkey % 5 = 0 THEN 'ZZZ'
        |              ELSE c_mktsegment END AS d_segment,
        |         cents + CASE WHEN c_custkey % 3 = 0 THEN 5 ELSE 0 END AS d_cents
        |  FROM cl WHERE c_custkey % 2 = 0
        |), cand AS (
        |  SELECT d.rid, c.c_custkey
        |  FROM dirty d JOIN cl c ON substr(d.d_name, 13, 6) = substr(c.c_name, 13, 6)
        |  UNION
        |  SELECT d.rid, c.c_custkey
        |  FROM dirty d JOIN cl c ON d.d_nation = c.c_nationkey
        |                        AND d.d_cents // 10000 = c.cents // 10000
        |), scored AS (
        |  SELECT cand.rid, cand.c_custkey,
        |         CAST(CASE WHEN d.d_name = c.c_name THEN 24
        |                   WHEN levenshtein(d.d_name, c.c_name) <= 2 THEN 12
        |                   ELSE -8 END
        |            + CASE WHEN d.d_segment = c.c_mktsegment THEN 10 ELSE -5 END
        |            + CASE WHEN d.d_nation = c.c_nationkey THEN 6 ELSE -12 END
        |            + CASE WHEN abs(d.d_cents - c.cents) <= 2 THEN 8 ELSE -4 END
        |           AS INTEGER) AS score
        |  FROM cand JOIN dirty d ON cand.rid = d.rid
        |            JOIN cl c ON cand.c_custkey = c.c_custkey
        |)
        |SELECT rid, c_custkey AS match_key, score,
        |       CASE WHEN score >= 33 THEN 'match' ELSE 'possible' END AS class
        |FROM scored WHERE score >= 16
        |ORDER BY rid, match_key""".stripMargin) { (s, d) =>
      val cl = Tables.customer(s, d).select(
        col("c_custkey"), col("c_name"), col("c_nationkey"),
        col("c_mktsegment"),
        floor(col("c_acctbal") * 100 + 0.5).cast("long").as("cents"))
      val dirty = cl.filter(col("c_custkey") % 2 === 0).select(
        (col("c_custkey") + 500000).as("rid"),
        when(col("c_custkey") % 13 === 0,
          concat(substring(col("c_name"), 1, 12), lit("XYZ"),
            substring(col("c_name"), 16, 99)))
          .when(col("c_custkey") % 7 === 0,
            concat(substring(col("c_name"), 1, 11), lit("X"),
              substring(col("c_name"), 13, 99)))
          .otherwise(col("c_name")).as("d_name"),
        col("c_nationkey").as("d_nation"),
        when(col("c_custkey") % 5 === 0, "ZZZ")
          .otherwise(col("c_mktsegment")).as("d_segment"),
        (col("cents") + when(col("c_custkey") % 3 === 0, 5).otherwise(0))
          .as("d_cents"))
      val passA = dirty.join(cl,
        substring(col("d_name"), 13, 6) === substring(col("c_name"), 13, 6))
        .select("rid", "c_custkey")
      val passB = dirty.join(cl,
        col("d_nation") === col("c_nationkey") &&
          expr("d_cents div 10000") === expr("cents div 10000"))
        .select("rid", "c_custkey")
      val cand = passA.union(passB).distinct()
      val scored = cand
        .join(dirty, Seq("rid")).join(cl, Seq("c_custkey"))
        .select(col("rid"), col("c_custkey"),
          (when(col("d_name") === col("c_name"), 24)
            .when(levenshtein(col("d_name"), col("c_name")) <= 2, 12)
            .otherwise(-8)
            + when(col("d_segment") === col("c_mktsegment"), 10).otherwise(-5)
            + when(col("d_nation") === col("c_nationkey"), 6).otherwise(-12)
            + when(abs(col("d_cents") - col("cents")) <= 2, 8).otherwise(-4))
            .cast("int").as("score"))
      scored.filter(col("score") >= 16)
        .select(col("rid"), col("c_custkey").as("match_key"), col("score"),
          when(col("score") >= 33, "match").otherwise("possible").as("class"))
        .orderBy("rid", "match_key")
    }
  )
}
