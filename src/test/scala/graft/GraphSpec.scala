package graft

import org.apache.spark.sql.functions._
import graft.operators.Graph

/** Hand-enumerable pins for connected components: transitivity across
  * chains (the property pair-wise dedup lacks), singletons, and the
  * empty-edge degenerate case. */
class GraphSpec extends SparkSuite {

  private def cc(vs: Seq[Long], es: Seq[(Long, Long)]): Map[Long, Long] = {
    val sp = spark
    import sp.implicits._
    Graph.connectedComponents(
      vs.toDF("id"), es.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("chain collapses transitively; components stay separate") {
    // 1-2, 2-3, 3-4 is a diameter-3 chain: 4 reaches label 1 only
    // through repeated propagation. 10-11 is a separate pair; 99 is a
    // singleton.
    val got = cc(Seq(1L, 2L, 3L, 4L, 10L, 11L, 99L),
      Seq((2L, 1L), (3L, 2L), (4L, 3L), (10L, 11L)))
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 99L -> 99L))
  }

  test("no edges: every vertex is its own cluster") {
    val got = cc(Seq(5L, 6L), Seq.empty)
    assert(got == Map(5L -> 5L, 6L -> 6L))
  }

  test("dedup_cc: clusters cover the corpus and canonicals are minima") {
    val out = SparkEntry.queries("dedup_cc")(spark, SparkSuite.Sf0001)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every cluster id is itself a member doc marked canonical
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (cl, members) =>
      val ids = members.map(_.getLong(0))
      assert(ids.min == cl, s"cluster $cl: min member ${ids.min}")
      assert(members.count(_.getBoolean(2)) == 1,
        s"cluster $cl: exactly one canonical expected")
    }
    // the seeded near-clones (doc_id+10000) must share their source's cluster
    val m = rows.map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cloned = m.keys.filter(_ >= 10000L)
    assert(cloned.nonEmpty)
    val joined = cloned.count(c => m(c) == m(c - 10000L))
    assert(joined * 100 >= cloned.size * 80,
      s"only $joined/${cloned.size} near-clones clustered with their source")
  }
}
