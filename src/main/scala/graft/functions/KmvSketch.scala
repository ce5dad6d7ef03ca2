package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** K-Minimum-Values distinct-count sketch (Bar-Yossef et al., RANDOM'02;
  * the "KMV" / bottom-k form surveyed in Beyer et al., SIGMOD'07) as a
  * typed `Aggregator`: state = the k smallest DISTINCT md5 values seen,
  * estimate = (k−1)/u_k where u_k is the k-th minimum normalized to
  * [0,1). Expected relative error ≈ 1/√(k−2) (~18% at k=32).
  *
  * Why this sketch here: it is fully DETERMINISTIC for a given hash —
  * unlike `approx_count_distinct`'s HLL the result is reproducible
  * bit-for-bit across engines, so the window-form twin
  * (`sketch_kmv_distinct` in operators/Sketches) is DuckDB-oracled
  * exactly, and SketchSpec pins this aggregator ≡ that query.
  *
  * Scale: the buffer is capped at k strings regardless of input size,
  * reduce/merge keep it sorted-deduped, and merge is commutative and
  * associative — map-side partial aggregation works, shuffle traffic is
  * O(k) per group, never O(distinct). That bounded merge is exactly
  * what the window-form twin lacks (it sorts every distinct value per
  * group), which is why THIS is the 100 TB form.
  *
  * When fewer than k distinct values ever arrive the sketch IS the
  * exact distinct set, and `finish` returns the exact count.
  */
object KmvSketch extends Aggregator[String, List[String], Double] {

  val K = 32
  private val Norm = 4.503599627370496e15 // 16^13 = 2^52, exact double

  override def zero: List[String] = Nil
  override def reduce(b: List[String], a: String): List[String] =
    BottomK.insert(b, BottomK.md5hex(a), K)(identity)
  override def merge(b1: List[String], b2: List[String]): List[String] =
    b2.foldLeft(b1)((acc, h) => BottomK.insert(acc, h, K)(identity))
  override def finish(b: List[String]): Double =
    if (b.size < K) b.size.toDouble // sketch never filled → exact
    else (K - 1).toDouble /
      (java.lang.Long.parseLong(b.last.take(13), 16).toDouble / Norm)
  override def bufferEncoder: Encoder[List[String]] =
    Encoders.kryo[List[String]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}

/** The same KMV sketch with the STATE as the output — the partial-
  * aggregate form for two-stage rollups (per-day sketches that later
  * merge across a window, the `evt_wau_sketch` shape). Mergeability is
  * the sketch's defining law: bottom-k(A ∪ B) = bottom-k(bottom-k(A) ∪
  * bottom-k(B)), so a union of per-day states IS the state of the
  * union — SketchSpec pins the whole pipeline bit-equal to the
  * window-form SQL twin. */
object KmvState extends Aggregator[String, List[String], List[String]] {
  override def zero: List[String] = Nil
  override def reduce(b: List[String], a: String): List[String] =
    BottomK.insert(b, BottomK.md5hex(a), KmvSketch.K)(identity)
  override def merge(b1: List[String], b2: List[String]): List[String] =
    b2.foldLeft(b1)((acc, h) => BottomK.insert(acc, h, KmvSketch.K)(identity))
  override def finish(b: List[String]): List[String] = b
  override def bufferEncoder: Encoder[List[String]] =
    Encoders.kryo[List[String]]
  override def outputEncoder: Encoder[List[String]] =
    Encoders.kryo[List[String]]
}

/** Merge of pre-built [[KmvState]] sketches into one estimate — stage
  * two of the rollup. Input is already-hashed bottom-k lists; the
  * estimate math is [[KmvSketch]]'s, so the exact-below-k path and the
  * (k−1)/u_k branch cannot drift between the one-shot and the
  * two-stage forms. */
object KmvUnion extends Aggregator[List[String], List[String], Double] {
  override def zero: List[String] = Nil
  override def reduce(b: List[String], a: List[String]): List[String] =
    a.foldLeft(b)((acc, h) => BottomK.insert(acc, h, KmvSketch.K)(identity))
  override def merge(b1: List[String], b2: List[String]): List[String] =
    reduce(b1, b2)
  override def finish(b: List[String]): Double = KmvSketch.finish(b)
  override def bufferEncoder: Encoder[List[String]] =
    Encoders.kryo[List[String]]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
