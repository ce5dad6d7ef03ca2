package graft

import graft.SparkSuite.Sf0001
import org.apache.spark.sql.functions._

/** Fuzzy entity-resolution join: the prefix-filtered candidate pipeline
  * must be EXACTLY the brute-force cross-join answer (the q-gram prefix
  * lemma promises zero false negatives at edit distance ≤ 2), with a
  * plan that never goes cartesian. */
class FuzzySpec extends SparkSuite {

  test("join_fuzzy_lookup ≡ brute-force cross-join argmin (total recall)") {
    val got = SparkEntry.queries("join_fuzzy_lookup")(spark, Sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq

    // brute force: every dirty row against every clean row
    val parts = Tables.part(spark, Sf0001)
      .select("p_partkey", "p_name").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def typo(name: String, key: Long): String = {
      val pos = (key % name.length).toInt
      name.substring(0, pos) + "q" + name.substring(pos + 1)
    }
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0
      }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val want = parts.map { case (k, name) =>
      val dn = typo(name, k)
      val best = parts.iterator
        .map { case (ck, cn) => (lev(dn, cn).toLong, ck) }
        .filter(_._1 <= 2)
        .min // (dist, key) lexicographic — the query's argmin order
      (k, best._2, best._1)
    }.sortBy(_._1).toSeq

    assert(got.length == parts.length, "a dirty row found no match")
    assert(got == want)
  }

  test("join_fuzzy_lookup plan: no cartesian product, no nested-loop join") {
    val plan = SparkEntry.queries("join_fuzzy_lookup")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
