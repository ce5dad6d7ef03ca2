package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Data-SELECTION operators for training-corpus curation: which rows of
  * a 100 TB corpus make it into the training mix, chosen exactly and
  * reproducibly. Two complementary selectors:
  *
  *  - `txt_sample_pps` — probability-proportional-to-size SYSTEMATIC
  *    sampling on a token-count budget (the "pick K representative
  *    documents weighted by length" step of corpus subsetting). Unlike
  *    Bernoulli thinning (txt_sample_weighted) or exact-k uniform draws
  *    (txt_sample_exact_k), systematic PPS guarantees the selected set
  *    covers the weight mass evenly: one pick per 1/K-th of the total
  *    token budget, in a deterministic pseudorandom order.
  *  - `txt_dsir` — Data Selection via Importance Resampling (Xie et
  *    al., NeurIPS 2023): score every raw document by how much more
  *    likely its hashed-bigram features are under a TARGET corpus's
  *    model than under the raw corpus's own model, then keep the
  *    target-like tail. The scalable form of "select web text that
  *    looks like Wikipedia".
  *
  * Engine-parity rules follow the module conventions (TextOps header):
  * hashes are md5 hex (byte-identical in DuckDB), ln() appears ONLY
  * under the floor(·×10⁶) micro-log quantization txt_lm_score proved
  * out, every other number is exact BIGINT/DECIMAL arithmetic, and
  * integer division is always non-negative so DuckDB's flooring `//`
  * and Spark's truncating `div` agree.
  *
  * The reference has no selection layer (it ships every verified row,
  * /root/reference/src/DataObject.ts:20-23); these are §2.12 extensions.
  */
object Selection {

  /** Non-empty whitespace tokens (TextOps.toks twin — local copy keeps
    * this module self-contained for the SQL mirror too). */
  private def toks(c: Column): Column =
    filter(split(c, " "), t => t =!= "")
  private val toksSql =
    "list_filter(string_split(text, ' '), x -> x <> '')"

  /** Word-bigram shingles over 1-indexed tokens, argument let-bound
    * (see TextOps.bigrams — an inlined `toks(text)` argument would
    * re-tokenize per element, O(m²) per doc). */
  private def bigrams(t: Column): Column =
    element_at(transform(array(t), tt =>
      transform(sequence(lit(1), size(tt) - 1),
        i => concat_ws(" ", element_at(tt, i), element_at(tt, i + 1)))), 1)
  private def bigramsSql(t: String): String =
    s"list_transform(range(1, len($t)), i -> concat($t[i], ' ', $t[i+1]))"

  /** 16-bit feature bucket of a bigram column named `name`: first four
    * md5 hex nibbles. `instr('0123456789abcdef', c) - 1` is the nibble
    * value in BOTH engines (txt_shuffle_shard precedent); the whole
    * expression is identical SQL text in both. 65 536 buckets keep the
    * model dimension broadcast-sized at any corpus size while making
    * feature collisions rare — an 8-bit space (tried first) packed
    * ~3.6 distinct bigrams per bucket on this corpus, which both
    * diluted the marker buckets' target ratio and handed clean docs
    * spurious boosts through bucket-mates (measured overlap). */
  private val DsirB = 65536
  private def bucketSql(name: String): String =
    "CAST(" + (1 to 4).map(i =>
      s"(instr('0123456789abcdef', substr(md5($name), $i, 1)) - 1) * ${1 << (4 * (4 - i))}")
      .mkString(" + ") + " AS INTEGER)"
  private def bucketCol(name: String): Column = expr(bucketSql(name))

  // ── DSIR fixture: a stylized target DOMAIN + a scoring corpus that ───
  // contains planted in-domain members (FIXTURES.md planted-
  // perturbation convention). The target is a separate text domain —
  // documents written entirely in a 4-word vocabulary the base corpus
  // never uses — and the scoring corpus is the base corpus plus
  // planted rows written in that same style. In-domain rows then score
  // provably positive (their buckets carry most of the target model's
  // mass) while every base row scores strongly negative (each of its
  // occurrences pays the target-absent add-one penalty
  // ≈ ln(1/(cr+1)) at its own raw frequency); the spec pins the
  // separation.
  //
  // Two rejected fixture designs, kept for the record: (1) marker
  // SUFFIX on real text — the shared base bigrams' model noise swamps
  // the 6-token marker on long docs (measured: 472/500 clean docs
  // outranked the weakest planted one); (2) whole-corpus re-styled
  // target — the planted copies inflate their own raw-side counts, so
  // planted docs eat a duplication penalty that can exceed the marker
  // boost (measured overlap again). A disjoint-vocabulary domain is
  // the shape with a provable margin.
  private val DsirStyle = Seq.fill(10)("gg hh ii jj").mkString(" ")

  /** Target corpus: one stylized doc per 5th id (identical in-domain
    * text — multinomial counts weigh token mass, not doc identity).
    * 1/5 beats the planted rows' 1/7 raw mass at every SF, so the
    * marker buckets' target/raw ratio ≥ 7/5 and planted weights are
    * positive BY CONSTRUCTION (the keep flag selects exactly them). */
  private def dsirTarget(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).filter(col("doc_id") % 5 === 0)
      .select(col("doc_id"), lit(DsirStyle).as("text"))
  private val dsirTargetSql =
    s"""tgt AS (
       |  SELECT doc_id, '$DsirStyle' AS text
       |  FROM documents WHERE doc_id % 5 = 0
       |)""".stripMargin

  /** Scoring corpus: all documents ∪ planted in-domain rows (every 7th
    * id, stylized text, id-offset +20000). */
  private def dsirScoring(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select("doc_id", "text")
    base.unionByName(
      base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + 20000).as("doc_id"),
          lit(DsirStyle).as("text")))
  }
  private val dsirScoringSql =
    s"""raw AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL
       |  SELECT doc_id + 20000 AS doc_id, '$DsirStyle' AS text
       |  FROM documents WHERE doc_id % 7 = 0
       |)""".stripMargin

  /** Number of systematic PPS draws. */
  private[operators] val PpsK = 37

  val queries: Seq[Q] = Seq(

    // ── PPS systematic sampling on a token budget ──────────────────────

    // Every document is weighted by its token count; documents are laid
    // out in a deterministic pseudorandom order (md5 of the salted id),
    // and one document is picked each time the running token total
    // crosses a 1/K-th of the corpus budget — the classic systematic
    // probability-proportional-to-size design (one pass, exact, no
    // rejection). Selection predicate is pure integer arithmetic:
    // pick ⟺ floor(cum·K/W) > floor((cum−w)·K/W), all BIGINT (the
    // products stay under 2⁶³ up to ~2.5·10¹⁷ corpus tokens / K=37; a
    // 100 TB deployment with a larger K moves the two products to
    // DECIMAL(38,0) unchanged).
    //
    // Scale shape: the corpus-order running sum NEVER runs as a global
    // window — the order key's first md5 nibble shards the corpus 16
    // ways, the prefix sum runs shard-partitioned, and cross-shard
    // offsets come from a 16-row bounded frame broadcast back (the
    // txt_shuffle_shard / agg_winsorized_dist pattern; (shard, h)
    // order ≡ global h order because the shard IS h's first nibble).
    // One exchange on shard, one 16-row side frame, zero joins at
    // corpus width.
    Q("txt_sample_pps",
      s"""WITH t AS (
         |  SELECT doc_id,
         |         CAST(len($toksSql) AS BIGINT) AS w,
         |         md5(concat('pps#', CAST(doc_id AS VARCHAR))) AS h
         |  FROM documents
         |), c AS (
         |  SELECT doc_id, w,
         |         SUM(w) OVER (ORDER BY h, doc_id
         |                      ROWS BETWEEN UNBOUNDED PRECEDING
         |                      AND CURRENT ROW) AS cum,
         |         (SELECT SUM(w) FROM t) AS tot
         |  FROM t
         |)
         |SELECT doc_id, w AS n_tokens, CAST(cum AS BIGINT) AS cum_tokens,
         |       CAST((cum * $PpsK) // tot AS BIGINT) AS slot
         |FROM c
         |WHERE (cum * $PpsK) // tot > ((cum - w) * $PpsK) // tot
         |ORDER BY doc_id""".stripMargin) { (s, d) =>
      val t = Tables.documents(s, d).select(
        col("doc_id"),
        size(toks(col("text"))).cast("long").as("w"),
        md5(concat(lit("pps#"), col("doc_id").cast("string"))).as("h"))
        .withColumn("shard",
          (expr("instr('0123456789abcdef', substr(h, 1, 1))") - 1).cast("int"))
      // shard-partitioned prefix sum in (h, doc_id) order
      val wIn = Window.partitionBy("shard").orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val withIn = t.withColumn("c_in", sum("w").over(wIn))
      // 16-row bounded frame: per-shard totals → running offsets + W
      val sh = t.groupBy("shard").agg(sum("w").as("tw"))
      val off = sh.withColumn("off",
        coalesce(sum("tw").over(Window.orderBy("shard")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select("shard", "off")
      val tot = sh.agg(sum("tw").as("tot"))
      withIn.join(broadcast(off), Seq("shard"))
        .crossJoin(broadcast(tot))
        .withColumn("cum", col("off") + col("c_in"))
        .filter(expr(s"(cum * $PpsK) div tot") >
          expr(s"((cum - w) * $PpsK) div tot"))
        .select(col("doc_id"), col("w").as("n_tokens"),
          col("cum").as("cum_tokens"),
          expr(s"(cum * $PpsK) div tot").as("slot"))
        .orderBy("doc_id")
    },

    // ── DSIR importance weighting ──────────────────────────────────────

    // Hashed n-gram importance resampling (Xie et al. 2023): fit two
    // 65 536-bucket multinomials over hashed bigram features — one on the
    // TARGET corpus, one on the RAW corpus — and weight every raw
    // document by Σ_features log(p_target/p_raw), add-one smoothed over the 65 536-bucket space.
    // The log-ratio per bucket reduces to ONE double division of two
    // exact BIGINT products, ln'd under the floor(·×10⁶) micro-log
    // quantization (txt_lm_score precedent), so each document's weight
    // is an exact BIGINT sum of model constants. keep = weight > 0
    // (more target-like than raw-like).
    //
    // Scale shape: the corpus is touched once (doc→bigram→bucket,
    // map-side-combined (doc,bucket) counts); BOTH models are ≤65 536-row
    // frames built by corpus-wide hash aggregates, joined back as
    // broadcasts (a few MB ceiling — independent of corpus size). The target corpus rides the same scan (it is a
    // filtered view). Zero corpus×corpus joins; the only event-scale
    // shuffles are the two bucket aggregates and the per-doc rollup.
    Q("txt_dsir",
      s"""WITH $dsirTargetSql, $dsirScoringSql,
         |tt AS (SELECT $toksSql AS t FROM tgt),
         |tb AS (SELECT ${bucketSql("b")} AS bucket
         |       FROM (SELECT unnest(${bigramsSql("t")}) AS b FROM tt) _t),
         |tc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS ct
         |       FROM tb GROUP BY bucket),
         |nt AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM tb),
         |rt AS (SELECT doc_id, $toksSql AS t FROM raw),
         |rb AS (SELECT doc_id, ${bucketSql("b")} AS bucket
         |       FROM (SELECT doc_id, unnest(${bigramsSql("t")}) AS b
         |             FROM rt) _r),
         |rc AS (SELECT bucket, CAST(COUNT(*) AS BIGINT) AS cr
         |       FROM rb GROUP BY bucket),
         |nr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rb),
         |model AS (
         |  SELECT rc.bucket,
         |         CAST(floor(ln(
         |           (CAST((COALESCE(tc.ct, 0) + 1) AS DOUBLE) * (nr.n + 65536))
         |           / (CAST((rc.cr + 1) AS DOUBLE) * (nt.n + 65536))
         |         ) * 1000000) AS BIGINT) AS lp_micro
         |  FROM rc LEFT JOIN tc ON rc.bucket = tc.bucket
         |  CROSS JOIN nt CROSS JOIN nr
         |),
         |db AS (SELECT doc_id, bucket, CAST(COUNT(*) AS BIGINT) AS n
         |       FROM rb GROUP BY doc_id, bucket)
         |SELECT db.doc_id,
         |       CAST(SUM(db.n) AS BIGINT) AS n_feats,
         |       CAST(SUM(db.n * m.lp_micro) AS BIGINT) AS w_micro,
         |       CAST(CASE WHEN SUM(db.n * m.lp_micro) > 0 THEN 1 ELSE 0 END
         |            AS INTEGER) AS keep
         |FROM db JOIN model m ON db.bucket = m.bucket
         |GROUP BY db.doc_id ORDER BY db.doc_id""".stripMargin) { (s, d) =>
      val tgtB = dsirTarget(s, d)
        .select(explode(bigrams(toks(col("text")))).as("b"))
        .select(bucketCol("b").as("bucket"))
      val rawB = dsirScoring(s, d)
        .select(col("doc_id"), explode(bigrams(toks(col("text")))).as("b"))
        .select(col("doc_id"), bucketCol("b").as("bucket"))
      val tc = tgtB.groupBy("bucket").agg(count(lit(1)).as("ct"))
      val nt = tgtB.agg(count(lit(1)).as("n_t"))
      val rc = rawB.groupBy("bucket").agg(count(lit(1)).as("cr"))
      val nr = rawB.agg(count(lit(1)).as("n_r"))
      val model = rc
        .join(tc, Seq("bucket"), "left")
        .crossJoin(broadcast(nt)).crossJoin(broadcast(nr))
        .select(col("bucket"),
          floor(log(
            ((coalesce(col("ct"), lit(0L)) + 1).cast("double") *
              (col("n_r") + 65536)) /
              ((col("cr") + 1).cast("double") * (col("n_t") + 65536)))
            * 1000000).cast("long").as("lp_micro"))
      val db = rawB.groupBy("doc_id", "bucket").agg(count(lit(1)).as("n"))
      db.join(broadcast(model), Seq("bucket"))
        .groupBy("doc_id")
        .agg(sum("n").as("n_feats"),
          sum(col("n") * col("lp_micro")).as("w_micro"))
        .select(col("doc_id"), col("n_feats"), col("w_micro"),
          when(col("w_micro") > 0, 1).otherwise(0).cast("int").as("keep"))
        .orderBy("doc_id")
    }
  )
}
