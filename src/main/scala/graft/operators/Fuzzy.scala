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
  * Scale design (100 TB): never a cross join. Candidates come from a
  * PPJoin-style prefix filter over padded character bigrams:
  *
  *   - q-gram lemma: one unit edit (ins/del/sub) rewrites at most q = 2
  *     padded bigram positions, so edit distance ≤ d destroys at most
  *     d·q = 4 DISTINCT bigrams of either side; survivors appear in the
  *     other string's set. Hence |S(a) ∩ S(b)| ≥ max(|S(a)|,|S(b)|) − 4.
  *   - prefix filter: sort every string's bigram SET by one global
  *     total order (corpus frequency asc, then gram text — rarest
  *     first); if the true overlap is ≥ |S| − 4 the first
  *     |S| − (|S| − 4) + 1 = 5 grams of BOTH sides must share an
  *     element. So each side indexes only its 5 rarest grams, and the
  *     equi-join on those never explodes on hot grams ("e " in every
  *     second name) the way a full gram join would.
  *
  * Candidates then pass the EXACT levenshtein ≤ 2 gate (codegen'd
  * built-in, identical classic DP in DuckDB), and the winner per dirty
  * row is the deterministic argmin (distance, then key) via one
  * `min(struct(...))` aggregate — no window, no second shuffle over
  * the verified set. The gram-frequency table is gram-universe-sized
  * (≤ a few hundred rows) and broadcasts; at 100 TB the clean side's
  * 5-gram prefix index is the materialize-once artifact every
  * incoming batch probes.
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
         |), cg AS (
         |  SELECT DISTINCT p_partkey, substr(concat('#', p_name, '#'), CAST(i AS INTEGER), 2) AS g
         |  FROM (SELECT p_partkey, p_name, unnest(range(1, length(p_name) + 2)) AS i FROM parts) t
         |), dg AS (
         |  SELECT DISTINCT dirty_id, substr(concat('#', dirty_name, '#'), CAST(i AS INTEGER), 2) AS g
         |  FROM (SELECT dirty_id, dirty_name, unnest(range(1, length(dirty_name) + 2)) AS i FROM dirty) t
         |), freq AS (
         |  SELECT g, count(*) AS f FROM cg GROUP BY g
         |), cp AS (
         |  SELECT p_partkey, g FROM (
         |    SELECT c.p_partkey, c.g,
         |           row_number() OVER (PARTITION BY c.p_partkey ORDER BY f.f, c.g) AS rn
         |    FROM cg c JOIN freq f USING (g)) t WHERE rn <= 5
         |), dp AS (
         |  SELECT dirty_id, g FROM (
         |    SELECT d.dirty_id, d.g,
         |           row_number() OVER (PARTITION BY d.dirty_id ORDER BY coalesce(f.f, 0), d.g) AS rn
         |    FROM dg d LEFT JOIN freq f USING (g)) t WHERE rn <= 5
         |), cand AS (
         |  SELECT DISTINCT dirty_id, p_partkey FROM dp JOIN cp USING (g)
         |), ver AS (
         |  SELECT c.dirty_id, c.p_partkey,
         |         CAST(levenshtein(d.dirty_name, p.p_name) AS BIGINT) AS lev_dist
         |  FROM cand c
         |  JOIN dirty d USING (dirty_id)
         |  JOIN parts p USING (p_partkey)
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
      val cg = grams(parts, "p_partkey", "p_name")
      val dg = grams(dirty, "dirty_id", "dirty_name")
      val freq = cg.groupBy("g").agg(count(lit(1)).as("f"))
      val cand = prefix(dg, "dirty_id", freq)
        .join(prefix(cg, "p_partkey", freq), Seq("g"))
        .select("dirty_id", "p_partkey").distinct()
      val ver = cand
        .join(dirty, Seq("dirty_id"))
        .join(parts, Seq("p_partkey"))
        .select(col("dirty_id"), col("p_partkey"),
          levenshtein(col("dirty_name"), col("p_name")).cast("long").as("lev_dist"))
        .filter(col("lev_dist") <= 2)
      ver.groupBy("dirty_id")
        .agg(min(struct(col("lev_dist"), col("p_partkey"))).as("best"))
        .select(col("dirty_id"), col("best.p_partkey").as("match_key"),
          col("best.lev_dist").as("lev_dist"))
        .orderBy("dirty_id")
    }
  )
}
