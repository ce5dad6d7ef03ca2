package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.LongType

/** Scale-safe global ordering primitives.
  *
  * `row_number() OVER (ORDER BY k)` with no PARTITION BY funnels the
  * whole dataset through ONE task — a hard scale-killer at 100 TB. The
  * distributed equivalent: range-repartition on the key (so partition i
  * holds a contiguous key range, all ranges ordered), sort within each
  * partition, then add per-partition offsets to partition-local indexes.
  * `zipWithIndex` does exactly that offset computation: one lightweight
  * count pass over the partitions, then a fully parallel index pass —
  * two linear scans, no single-task stage, deterministic output
  * identical to the global window.
  */
object Ranking {

  /** Global 1-based row number ordered by `key` (which must be unique
    * for a deterministic result), appended as column `row_num`. */
  def globalRowNumber(df: DataFrame, key: String,
      numPartitions: Int): DataFrame =
    globalRowNumber(df, Seq(key), numPartitions)

  /** Composite-key form: ordered by `keys` lexicographically; the TUPLE
    * must be unique for a deterministic result. */
  def globalRowNumber(df: DataFrame, keys: Seq[String],
      numPartitions: Int): DataFrame = {
    val spark = df.sparkSession
    val ranged = df.repartitionByRange(numPartitions, keys.map(col): _*)
      .sortWithinPartitions(keys.head, keys.tail: _*)
    val indexed = ranged.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(indexed, ranged.schema.add("row_num", LongType))
  }
}
