package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join (100 TB toolbox): when one join key carries a
  * disproportionate share of the big side, a plain shuffle join puts the
  * whole hot key in one task. Salting spreads it: the big side gets a
  * salt in [0, n), the dimension side is replicated n× with every salt
  * value, and the join keys on (key, salt) — same rows out, n-way
  * parallelism on the hot key. (AQE's skew-join handles the moderate
  * cases automatically; explicit salting is for the pathological ones or
  * for aggregations.)
  */
object Skew {

  /** Semantically identical to `big.join(dim, Seq(key), joinType)` for
    * inner/left joins where `dim` is unique on `key`.
    *
    * WHEN to reach for it — measured, not folklore (SKEWPROBE.json,
    * sf1-skew replica, 16 cpus, prewarmed median-of-3): with the
    * fixture's 25% hot-key share the salted form LOSES to the plain
    * shuffle join both under AQE (0.68×) and statically planned
    * (0.58×) — the ×salts dim replication costs more than the
    * straggler saves when the whole join is ~1 s. The crossover sits
    * near 50% statically-planned hot share (1.02×), and salting wins
    * clearly at 75% (1.25×). On a real cluster the crossover moves far
    * LEFT of these local numbers: the hot task doesn't just straggle,
    * it spills or OOMs, which a local[n] probe cannot exhibit — and
    * AQE's skew split only helps JOINs, never skewed aggregations.
    * The decision rule ships as a query: see `salt_advisory` below. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * group once on (key, salt) — map-side combine splits the hot key
    * across tasks — then re-aggregate on key. `sum` shown; any
    * re-aggregable aggregate fits the shape. */
  def saltedSumByKey(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }

  val queries: Seq[Q] = Seq(

    // Salted hot-key join, end to end: events.event_type has a handful
    // of distinct values, so EVERY key is pathologically hot — the
    // exact shape where a plain shuffle join serializes each key into
    // one task. [[saltedJoin]] spreads each hot key across 8 salt
    // lanes (big side salted, dim side replicated ×8, join on
    // (key, salt)); the enriched rows then roll up to a per-user
    // rarity score Σ (total div type_count) in exact BIGINT integer
    // division, so the hash oracle is engine-exact. At this dim size
    // AQE would broadcast and sidestep the skew anyway — the query
    // pins the salted plan's CORRECTNESS (ScaleSpec pins ≡ plain join
    // on hand data); the shape earns its keep when the dim is too big
    // to broadcast but the fact keys are hot.
    Q("join_skew_salt",
      """WITH e AS (SELECT user_id, event_type FROM events),
        |d AS (SELECT event_type, COUNT(*) AS cnt FROM e GROUP BY event_type),
        |t AS (SELECT COUNT(*) AS total FROM e)
        |SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
        |       CAST(SUM(t.total // d.cnt) AS BIGINT) AS rarity
        |FROM e JOIN d USING (event_type) CROSS JOIN t
        |GROUP BY e.user_id
        |ORDER BY e.user_id""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("user_id", "event_type")
      val dim = e.groupBy("event_type").agg(count(lit(1)).as("cnt"))
      val total = e.agg(count(lit(1)).as("total"))
      saltedJoin(e, dim, "event_type", 8)
        .crossJoin(broadcast(total)) // one-row broadcast probe
        .groupBy("user_id")
        .agg(count(lit(1)).as("n_events"),
          sum(expr("total div cnt")).as("rarity"))
        .orderBy("user_id")
    },

    // Exact count-distinct under group-key skew: a hot group key makes
    // `COUNT(DISTINCT user)` build one giant per-key distinct set.
    // Salting by HASH OF THE DISTINCT KEY (not round-robin — the same
    // user must land in the same lane or lanes would double-count)
    // splits each group's distinct set across 8 lanes whose partial
    // distinct counts are disjoint, so the final per-key SUM is exact.
    // This is the two-phase exact form of the problem HLL sketches
    // solve approximately (evt_wau_sketch); same plan shape at any
    // lane count. Oracle: DuckDB's plain COUNT(DISTINCT).
    Q("agg_skew_distinct",
      """SELECT event_type,
        |       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
        |       CAST(COUNT(*) AS BIGINT) AS n_events
        |FROM events
        |GROUP BY event_type
        |ORDER BY event_type""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d).select("event_type", "user_id")
      e.withColumn("__salt", pmod(hash(col("user_id")), lit(8)))
        .groupBy(col("event_type"), col("__salt"))
        .agg(count_distinct(col("user_id")).as("__pd"),
          count(lit(1)).as("__pn"))
        .groupBy("event_type")
        .agg(sum(col("__pd")).as("n_users"), sum(col("__pn")).as("n_events"))
        .orderBy("event_type")
    },

    // The salt-or-trust-AQE decision rule as a QUERY (VERDICT r12 #6):
    // SKEWPROBE measured that explicit salting loses to the plain
    // shuffle join below ~50% statically-planned hot-key share
    // (25% hot: 0.58× static / 0.68× under AQE; 50%: 1.02×; 75%:
    // 1.25× — sf1-skew replica, 16 cpus), so "always salt" is folklore
    // that costs real time. This advisory profiles the candidate join
    // keys of the fact table and emits the measured rule's verdict per
    // key: hot-key share ≥ 0.5 → 'salt', below → 'aqe' (trust the
    // runtime re-plan / broadcast). Plan shape is scale-safe on
    // purpose: two aggregation passes plus an equi-join back on the
    // max count — no global Window, so no single task ever holds a
    // whole key column even when the key is user-grained. Ties on the
    // max count break to the MIN key string, deterministically on both
    // engines. At cluster scale the 0.5 constant is the LOCAL
    // crossover; the scaladoc on [[saltedJoin]] records why the true
    // crossover moves left as data grows (spill/OOM, not straggle).
    Q("salt_advisory",
      """WITH s AS (
        |  SELECT 'event_type' AS key_col, CAST(event_type AS VARCHAR) AS k,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |  UNION ALL
        |  SELECT 'user_id' AS key_col, CAST(user_id AS VARCHAR) AS k,
        |         CAST(COUNT(*) AS BIGINT) AS n
        |  FROM events GROUP BY 1, 2
        |), a AS (
        |  SELECT key_col, MAX(n) AS maxn,
        |         CAST(SUM(n) AS BIGINT) AS total
        |  FROM s GROUP BY 1
        |), h AS (
        |  SELECT s.key_col, MIN(s.k) AS hot_key, a.maxn, a.total
        |  FROM s JOIN a ON s.key_col = a.key_col AND s.n = a.maxn
        |  GROUP BY s.key_col, a.maxn, a.total
        |)
        |SELECT key_col, hot_key,
        |       CAST(maxn AS DOUBLE) / CAST(total AS DOUBLE) AS hot_share,
        |       CASE WHEN CAST(maxn AS DOUBLE) / CAST(total AS DOUBLE) >= 0.5
        |            THEN 'salt' ELSE 'aqe' END AS advisory
        |FROM h ORDER BY key_col""".stripMargin) { (s, d) =>
      val e = Tables.events(s, d)
      def keyed(colName: String) =
        e.groupBy(col(colName).cast("string").as("k"))
          .agg(count(lit(1)).as("n"))
          .select(lit(colName).as("key_col"), col("k"), col("n"))
      val counts = keyed("event_type").unionByName(keyed("user_id"))
      val agg = counts.groupBy("key_col")
        .agg(max(col("n")).as("maxn"), sum(col("n")).as("total"))
      val share = col("maxn").cast("double") / col("total").cast("double")
      counts.join(agg, Seq("key_col"))
        .where(col("n") === col("maxn"))
        .groupBy("key_col", "maxn", "total")
        .agg(min(col("k")).as("hot_key"))
        .select(col("key_col"), col("hot_key"),
          share.as("hot_share"),
          when(share >= 0.5, lit("salt")).otherwise(lit("aqe"))
            .as("advisory"))
        .orderBy("key_col")
    }
  )
}
