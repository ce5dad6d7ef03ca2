package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Misra-Gries frequent-items sketch: K counters of bounded state that
  * answer "which items occur more than n/(K+1) times" over a stream of
  * any length. The classical guarantee: every item's sketch estimate
  * `est` satisfies `true − n/(K+1) <= est <= true`, so every item with
  * true frequency above n/(K+1) is PRESENT in the sketch; items below
  * the bar may appear but never with an inflated count. Merging two
  * sketches (Agarwal et al., "Mergeable Summaries", PODS'12) sums the
  * counter maps and, when over K entries, subtracts the (K+1)-th
  * largest count from all — the error bounds add, keeping the same
  * n/(K+1) guarantee over the combined stream.
  *
  * UNLIKE [[KmvSketch]]/[[BottomKSample]] (pure functions of the input
  * multiset), a Misra-Gries sketch's exact counter values depend on
  * arrival/merge order WITHIN the guarantee band — so there is no
  * bit-equal oracled twin. The oracled query (`sketch_heavyhitters` in
  * operators/TextOps) is the EXACT heavy-hitters answer the sketch
  * approximates; FreqSketchSpec pins the superset + error-bound
  * guarantees against exact counts instead.
  *
  * Scale shape: state is O(K) per group, merge is map-side-combinable —
  * the corpus-size-independent alternative to the exact groupBy count
  * when the vocabulary (not the corpus) is what doesn't fit.
  */
object FreqSketch extends Aggregator[String, Map[String, Long], Map[String, Long]] {

  val K = 64

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], a: String): Map[String, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1)
      case None if b.size < K => b.updated(a, 1L)
      // classic decrement-all step: one unit off every counter (the new
      // item's implicit counter hits zero and is never stored)
      case None => b.collect { case (k, v) if v > 1 => k -> (v - 1) }
    }

  override def merge(b1: Map[String, Long], b2: Map[String, Long]): Map[String, Long] = {
    val combined = b2.foldLeft(b1) { case (acc, (k, v)) =>
      acc.updated(k, acc.getOrElse(k, 0L) + v)
    }
    if (combined.size <= K) combined
    else {
      // subtract the (K+1)-th largest count from everything, drop <= 0:
      // exactly K survivors at most, error adds by at most that count
      val cStar = combined.values.toIndexedSeq.sorted(Ordering[Long].reverse)(K)
      combined.collect { case (k, v) if v > cStar => k -> (v - cStar) }
    }
  }

  override def finish(b: Map[String, Long]): Map[String, Long] = b

  override def bufferEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    Encoders.kryo[Map[String, Long]]
}
