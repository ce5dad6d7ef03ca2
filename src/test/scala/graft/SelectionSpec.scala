package graft

import org.apache.spark.sql.functions._

import graft.SparkSuite.{Sf0001, Sf001}

/** Data-selection operators (operators/Selection.scala): PPS systematic
  * sampling invariants and DSIR target-likeness separation. Both
  * queries are DuckDB-oracled; these pins cover the semantic properties
  * an oracle hash cannot state (budget coverage, planted-row ranking).
  */
class SelectionSpec extends SparkSuite {

  test("txt_sample_pps: exactly K picks, one per budget slot, " +
      "covering the token mass in order") {
    val picks = SparkEntry.queries("txt_sample_pps")(spark, Sf001).collect()
    assert(picks.length == 37, s"picked ${picks.length} docs, want K=37")
    val slots = picks.map(_.getAs[Long]("slot")).sorted
    assert(slots.toSeq == (1L to 37L),
      s"slots not exactly 1..37: ${slots.mkString(",")}")
    // picks ordered by cumulative position carry strictly increasing
    // slots — systematic coverage of the budget, no clustered draws
    val byCum = picks.sortBy(_.getAs[Long]("cum_tokens"))
      .map(_.getAs[Long]("slot"))
    assert(byCum.zip(byCum.tail).forall { case (a, b) => a < b },
      "slots not strictly increasing along the cumulative order")
  }

  test("txt_sample_pps: deterministic across runs and scale factors " +
      "are independent draws (sf0.001 also yields exactly K)") {
    val a = SparkEntry.queries("txt_sample_pps")(spark, Sf001)
      .collect().map(_.toString).sorted
    val b = SparkEntry.queries("txt_sample_pps")(spark, Sf001)
      .collect().map(_.toString).sorted
    assert(a.sameElements(b), "PPS sample not reproducible")
    val small = SparkEntry.queries("txt_sample_pps")(spark, Sf0001).collect()
    assert(small.length == 37, s"sf0.001 picked ${small.length}, want 37")
  }

  test("txt_dsir: every planted target-flavoured row outranks every " +
      "clean row, and is kept") {
    val rows = SparkEntry.queries("txt_dsir")(spark, Sf001).collect()
    val (planted, clean) = rows.partition(_.getAs[Long]("doc_id") >= 20000)
    assert(planted.nonEmpty && clean.nonEmpty)
    val minPlanted = planted.map(_.getAs[Long]("w_micro")).min
    val maxClean = clean.map(_.getAs[Long]("w_micro")).max
    assert(minPlanted > maxClean,
      s"planted min $minPlanted !> clean max $maxClean — marker bigrams " +
        "not separating target-likeness")
    assert(planted.forall(_.getAs[Int]("keep") == 1),
      "a planted target-like row was not kept")
  }

  test("txt_dsir: keep flag is exactly the w_micro sign predicate") {
    val rows = SparkEntry.queries("txt_dsir")(spark, Sf0001).collect()
    rows.foreach { r =>
      val expected = if (r.getAs[Long]("w_micro") > 0) 1 else 0
      assert(r.getAs[Int]("keep") == expected, r.toString)
    }
  }
}
