package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Data-layout keys for multi-dimensional scan pruning — the
  * write-time half of "push down and prune". A table clustered on ONE
  * column prunes min/max row-group stats on that column only; queries
  * filtering the OTHER dimension scan everything. Interleaving the bits
  * of two dimensions into one Z-ORDER key and sorting the write by it
  * bounds BOTH dimensions within every file/row-group (each chunk of
  * the z-curve is a small rectangle in (dim1, dim2) space), so min/max
  * pruning works for filters on either dimension — the technique behind
  * Delta/Iceberg `OPTIMIZE ZORDER BY`. The key itself is pure per-row
  * integer bit math (codegen'd, zero shuffle); the sort is the write's
  * `orderBy`, amortized once at ingest. LayoutSpec proves the locality
  * claim: z-sorted chunks bound both dimensions, single-column-sorted
  * chunks bound only their own.
  */
object Layout {

  private val Bits = 16

  /** Bit-interleave two (≤ 16-bit) non-negative ints: dim1 takes even
    * bit positions, dim2 odd. */
  def zkey(dim1: Column, dim2: Column): Column =
    (0 until Bits).map { i =>
      shiftright(dim1, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)) +
        shiftright(dim2, i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1))
    }.reduce(_ + _)

  /** DuckDB mirror over column expressions `dim1`, `dim2`. */
  private def zkeySql(dim1: String, dim2: String): String =
    (0 until Bits).map { i =>
      s"(($dim1 >> $i) & 1) * ${1L << (2 * i)} + " +
        s"(($dim2 >> $i) & 1) * ${1L << (2 * i + 1)}"
    }.mkString("(", " + ", ")")

  val queries: Seq[Q] = Seq(

    // Z-order key over (customer, order day) for the orders table — the
    // clustering key a lakehouse write would ORDER BY so that both
    // per-customer and per-date-range queries prune at the scan.
    Q("fn_zorder", {
      val day = "date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))"
      s"""SELECT o_orderkey,
         |       CAST((o_custkey & 65535) AS BIGINT) AS cust16,
         |       CAST(($day & 65535) AS BIGINT) AS day16,
         |       CAST(${zkeySql("(o_custkey & 65535)", s"($day & 65535)")}
         |            AS BIGINT) AS zkey
         |FROM orders ORDER BY o_orderkey""".stripMargin }) { (s, d) =>
      val day = datediff(col("o_orderdate").cast("date"),
        to_date(lit("1995-01-01")))
      Tables.orders(s, d)
        .select(col("o_orderkey"),
          col("o_custkey").bitwiseAND(lit(65535L)).as("cust16"),
          day.cast("long").bitwiseAND(lit(65535L)).as("day16"))
        .select(col("o_orderkey"), col("cust16"), col("day16"),
          zkey(col("cust16"), col("day16")).as("zkey"))
        .orderBy("o_orderkey")
    }
  )
}
