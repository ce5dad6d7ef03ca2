package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Bottom-k-by-hash uniform sample with payloads — the quantile
  * companion of [[KmvSketch]]: keep the k rows whose key hashes
  * smallest (a deterministic uniform sample, rerun-stable on any
  * cluster), then read rank-based quantiles off the sample. Like KMV
  * (and unlike t-digest/GK sketches) the result is a pure function of
  * the hash, so the window-form twin (`sketch_quantile` in
  * operators/Sketches) is DuckDB-oracled exactly and SketchSpec pins
  * this aggregator equal to it.
  *
  * State caps at k (hash, value) pairs; merge is commutative and
  * associative (map-side combine safe); shuffle is O(k) per group.
  * `finish` returns the sample's values sorted ascending — rank-based
  * quantile selection (`index ⌈q·n⌉`, 1-based) is the caller's one
  * line, kept outside so one sample serves every quantile.
  *
  * Tie handling: inserts key on the full (hash, value) pair, not the
  * hash alone, so the result is a pure function of the input MULTISET —
  * commutative/associative even when the same key arrives with
  * different values (a hash-only key would keep whichever value a
  * partition saw first). Exact duplicate (key, value) rows still
  * collapse to one sample entry; note the oracled window twin
  * (`sketch_quantile`) counts such duplicate rows separately, so the
  * spec-pinned equality with it additionally relies on keys being
  * distinct per group in the data.
  */
object BottomKSample extends Aggregator[(String, Double),
    List[(String, Double)], Seq[Double]] {

  val K = 64

  // fixed-width suffix: md5 is 32 hex chars, so comparing hash+bits
  // strings orders primarily by hash and breaks ties deterministically
  // on the value's exact bit pattern
  private def key(p: (String, Double)): String =
    p._1 + java.lang.String.format("%016x",
      java.lang.Long.valueOf(java.lang.Double.doubleToLongBits(p._2)))

  override def zero: List[(String, Double)] = Nil
  override def reduce(b: List[(String, Double)],
      a: (String, Double)): List[(String, Double)] =
    BottomK.insert(b, (BottomK.md5hex(a._1), a._2), K)(key)
  override def merge(b1: List[(String, Double)],
      b2: List[(String, Double)]): List[(String, Double)] =
    b2.foldLeft(b1)((acc, p) => BottomK.insert(acc, p, K)(key))
  override def finish(b: List[(String, Double)]): Seq[Double] =
    b.map(_._2).sorted
  override def bufferEncoder: Encoder[List[(String, Double)]] =
    Encoders.kryo[List[(String, Double)]]
  override def outputEncoder: Encoder[Seq[Double]] =
    Encoders.kryo[Seq[Double]]

  /** Rank-based quantile of a sorted sample: the ⌈q·n⌉-th value. */
  def quantile(sorted: Seq[Double], q: Double): Double =
    sorted(math.ceil(q * sorted.size).toInt - 1)
}
