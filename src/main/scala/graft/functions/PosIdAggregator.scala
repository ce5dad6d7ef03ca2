package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** One POS line: event time (TIMESTAMP_NTZ — parquet ms timestamps
  * surface as NTZ in Spark 4), unique id (tie-break), formatted
  * fragment. */
final case class PosEntry(ts: java.time.LocalDateTime, id: Long, s: String)

/** Typed `Aggregator` twin of the built-in ordered string concat
  * (`agg_string_concat`'s `array_sort(collect_list(struct))` form) — the
  * reference's `map→reduce(join)` posId build
  * (/root/reference/src/queries.ts:126-141) IS a custom ordered string
  * aggregate, so the engine exposes it as a first-class UDAF too
  * (SURVEY §2.11 extension surface). Kept off the query hot paths; the
  * codegen'd built-in form is used there. Tests assert both forms agree.
  *
  * The merge is order-insensitive (sort happens once in `finish`), so
  * partial aggregation / map-side combine stays correct at any
  * partitioning.
  */
object PosIdAggregator extends Aggregator[PosEntry, List[PosEntry], String] {
  override def zero: List[PosEntry] = Nil
  override def reduce(b: List[PosEntry], a: PosEntry): List[PosEntry] = a :: b
  override def merge(b1: List[PosEntry], b2: List[PosEntry]): List[PosEntry] =
    b1 ::: b2
  override def finish(b: List[PosEntry]): String =
    b.sortBy(e => (e.ts.toEpochSecond(java.time.ZoneOffset.UTC),
      e.ts.getNano, e.id)).map(_.s).mkString
  override def bufferEncoder: Encoder[List[PosEntry]] =
    Encoders.kryo[List[PosEntry]]
  override def outputEncoder: Encoder[String] = Encoders.STRING
}
