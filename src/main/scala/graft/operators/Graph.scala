package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Q

/** Connected components over the near-duplicate candidate graph — the
  * stage after pair generation in a dedup pipeline: candidate PAIRS say
  * "these two look alike"; the CLUSTER decides which single doc
  * survives. Transitivity matters (A~B, B~C must collapse to one
  * survivor even if A~C was never a candidate pair), so pair-wise
  * dedup alone under-deletes.
  *
  * Implementation: iterative min-label propagation — every vertex
  * starts as its own label, each round takes the min label across
  * itself and its neighbors, fixpoint when no label changes. Each round
  * is one shuffle join + one hash aggregate; `localCheckpoint` cuts the
  * lineage so round N's plan doesn't re-derive rounds 1..N-1. Round
  * count = component DIAMETER, which for near-dup clusters is small
  * (clones of one source doc form near-cliques); a corpus whose
  * components could be long chains would use the large-star/small-star
  * reformulation (Kiveris et al., "Connected Components in MapReduce
  * and Beyond", SoCC'14) for O(log n) rounds — same join-per-round
  * shape, so the swap is local.
  *
  * The oracle is a DuckDB RECURSIVE CTE transitive closure — an
  * independent fixpoint formulation, not a mirror of the loop.
  */
object Graph {

  /** Min-label-propagation connected components.
    * @param vertices one column `id`
    * @param edges    two columns `src`, `dst` (undirected; any orientation)
    * @return (`id`, `label`) where `label` = min vertex id in the component
    */
  def connectedComponents(vertices: DataFrame, edges: DataFrame,
                          maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col("src"), col("dst"))
      .unionByName(edges.select(col("dst").as("src"), col("src").as("dst")))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var labels = vertices.select(col("id"), col("id").as("label"))
      .localCheckpoint()
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      val viaNbr = sym.join(labels, sym("dst") === labels("id"))
        .select(sym("src").as("id"), col("label"))
      val next = labels.unionByName(viaNbr)
        .groupBy("id").agg(min("label").as("label"))
        .localCheckpoint()
      // labels only ever decrease, so "<" counts exactly the changes
      changed = next
        .join(labels.select(col("id"), col("label").as("prev")), Seq("id"))
        .filter(col("label") < col("prev")).count()
      labels = next
      it += 1
    }
    sym.unpersist()
    labels
  }

  val queries: Seq[Q] = Seq(

    // Cluster the MinHash-banded candidate pairs of the near-clone
    // corpus; canonical survivor = min doc_id of the component. Docs
    // with no candidate partner are their own singleton cluster (kept
    // verbatim by the dedup).
    Q("dedup_cc",
      s"""WITH RECURSIVE ${TextOps.minhashCandSql},
         |sym AS (
         |  SELECT a_id AS src, b_id AS dst FROM cand
         |  UNION ALL
         |  SELECT b_id AS src, a_id AS dst FROM cand
         |), reach(src, dst) AS (
         |  SELECT doc_id, doc_id FROM docs
         |  UNION
         |  SELECT r.src, s.dst FROM reach r JOIN sym s ON r.dst = s.src
         |)
         |SELECT src AS doc_id, MIN(dst) AS cluster,
         |       MIN(dst) = src AS is_canonical
         |FROM reach GROUP BY src ORDER BY doc_id""".stripMargin) { (s, d) =>
      val vertices = TextOps.withNearClones(s, d)
        .select(col("doc_id").as("id"))
      val edges = TextOps.minhashCandidates(s, d)
        .select(col("a_id").as("src"), col("b_id").as("dst"))
      connectedComponents(vertices, edges)
        .select(col("id").as("doc_id"), col("label").as("cluster"),
          (col("label") === col("id")).as("is_canonical"))
        .orderBy("doc_id")
    }
  )
}
