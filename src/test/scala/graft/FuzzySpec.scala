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

  test("join_blocked_er: every base pair's presence, score, and class " +
      "match the F-S weight replay of its perturbation profile") {
    // replay the deterministic perturbation rules → expected field
    // weights; a base pair must appear iff its total clears the
    // possible threshold, classed by the match threshold
    val got = SparkEntry.queries("join_blocked_er")(spark, Sf0001)
      .collect()
      .map(r => (r.getAs[Long]("rid"), r.getAs[Long]("match_key")) ->
        (r.getAs[Int]("score"), r.getAs[String]("class"))).toMap
    val keys = Tables.customer(spark, Sf0001)
      .select("c_custkey").collect().map(_.getLong(0)).filter(_ % 2 == 0)
    keys.foreach { k =>
      val nameW = if (k % 13 == 0) -8 else if (k % 7 == 0) 12 else 24
      val segW = if (k % 5 == 0) -5 else 10
      val centsW = if (k % 3 == 0) -4 else 8
      val total = nameW + segW + 6 + centsW
      val pair = (k + 500000, k)
      if (total >= 16) {
        assert(got.contains(pair), s"base pair $pair (score $total) absent")
        val (score, cls) = got(pair)
        assert(score == total, s"pair $pair: score $score, replay $total")
        val wantCls = if (total >= 33) "match" else "possible"
        assert(cls == wantCls, s"pair $pair: class $cls, replay $wantCls")
      } else {
        assert(!got.contains(pair),
          s"base pair $pair (score $total) should be nonmatch-dropped")
      }
    }
  }

  test("join_blocked_er plan: blocking is equi-joins only — no " +
      "cartesian, no nested loop; levenshtein never sees a cross join") {
    val plan = SparkEntry.queries("join_blocked_er")(spark, Sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(800))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(800))
  }
}
