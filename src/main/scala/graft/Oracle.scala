package graft

/** DuckDB-side mirror of `Tables`: the same reference-shaped views as
  * ANSI SQL CTE text, spliced into every `SparkEntry.oracleSql` entry.
  * Any semantic change in `Tables` MUST be mirrored here — the driver
  * hash-compares Spark results against DuckDB running this SQL on the
  * same parquet files.
  */
object Oracle {

  /** `Tables.charge` as SQL. */
  val charge: String =
    """charge AS (
      |  SELECT l_orderkey * 100 + l_linenumber AS id,
      |         CAST(l_shipdate AS DATE) AS date,
      |         CAST(CAST(l_extendedprice AS DECIMAL(12,4))
      |              * (1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(18,4))
      |           * (CASE WHEN l_returnflag = 'R' THEN -1 ELSE 1 END) AS amount,
      |         CAST(o_custkey AS VARCHAR) AS customerId,
      |         lpad(CAST(l_linenumber AS VARCHAR), 4, '0') AS seqNo,
      |         CAST(l_suppkey AS VARCHAR) AS terminalId,
      |         l_shipdate AS tranTimeStamp,
      |         CASE WHEN l_linestatus = 'F' THEN 13 ELSE 14 END AS tranType
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |)""".stripMargin

  /** `Tables.terms` as SQL. */
  val terms: String =
    """terms AS (
      |  SELECT CAST(c_custkey AS VARCHAR) AS customerId,
      |         concat('xid-', CAST(c_custkey AS VARCHAR)) AS xeroId,
      |         CASE WHEN c_mktsegment = 'BUILDING' THEN 'DAYSAFTERBILLDATE'
      |              WHEN c_mktsegment = 'AUTOMOBILE' THEN 'OFFOLLOWINGMONTH'
      |              ELSE NULL END AS termsType,
      |         CAST(c_nationkey + 7 AS INTEGER) AS termsDays
      |  FROM customer
      |)""".stripMargin

  /** `Tables.tillTotals` as SQL. */
  val tillTotals: String =
    """till AS (
      |  SELECT CAST(o_orderdate AS DATE) AS date,
      |         COUNT(DISTINCT o_custkey) AS customerCount,
      |         SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS totalSales,
      |         SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END) AS totalCash,
      |         SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END) AS totalCheques,
      |         SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END) AS totalEFTPOS,
      |         SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN CAST(o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END) AS totalAccountSales,
      |         SUM(CASE WHEN o_orderpriority = '5-LOW' THEN CAST(o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END) AS totalPayoutInstants,
      |         SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(12,4)) ELSE CAST(0 AS DECIMAL(12,4)) END) AS totalPayoutLotto,
      |         CAST(SUM(CAST(o_totalprice AS DECIMAL(12,4))) AS DECIMAL(18,4)) * CAST(0.0909 AS DECIMAL(6,4)) AS totalGst,
      |         COUNT(*) AS orderCount,
      |         (COUNT(DISTINCT o_custkey) % 5) * CAST(0.01 AS DECIMAL(3,2)) - CAST(0.02 AS DECIMAL(3,2)) AS totalRounding
      |  FROM orders GROUP BY 1
      |)""".stripMargin

  /** `Tables.department` as SQL. */
  val department: String =
    """deptdim AS (
      |  SELECT p_brand AS deptCode,
      |         p_brand AS deptDisplayName,
      |         concat('4', lpad(CAST(MIN(p_size) AS VARCHAR), 3, '0')) AS glCodeSales
      |  FROM part GROUP BY p_brand
      |)""".stripMargin

  /** `Tables.deptSales` as SQL. */
  val deptSales: String =
    """dept AS (
      |  SELECT CAST(l_shipdate AS DATE) AS date,
      |         p_brand AS deptCode,
      |         SUM(CAST(CAST(l_extendedprice AS DECIMAL(12,4))
      |             * (1 - CAST(l_discount AS DECIMAL(12,4))) AS DECIMAL(18,4))) AS sellEx
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2
      |)""".stripMargin

  /** `Tables.xlsxCharges` as SQL. */
  val xlsxCharges: String =
    """xlsx AS (
      |  SELECT date, customerId, seqNo,
      |         amount + (CASE WHEN id % 91 = 0 THEN CAST(0.01 AS DECIMAL(12,4))
      |                        ELSE CAST(0 AS DECIMAL(12,4)) END) AS amount,
      |         concat('note-', CAST(id AS VARCHAR)) AS notes
      |  FROM charge WHERE id % 7 = 0
      |)""".stripMargin

  /** `Fns.dueDate` as SQL (all four reference branches,
    * /root/reference/src/helpers.ts:228-259). */
  def dueDateSql(date: String, termsType: String, termsDays: String): String =
    s"""CASE WHEN $termsType = 'DAYSAFTERBILLDATE'
       |       THEN CAST($date + $termsDays * INTERVAL '1 day' AS DATE)
       |     WHEN $termsType = 'OFFOLLOWINGMONTH'
       |       THEN CAST(CAST(date_trunc('month', $date + INTERVAL 1 MONTH) AS DATE)
       |                 + ($termsDays - 1) * INTERVAL '1 day' AS DATE)
       |     WHEN $termsType IS NULL
       |       THEN last_day(CAST($date + INTERVAL 1 MONTH AS DATE))
       |     ELSE $date END""".stripMargin

  /** `Fns.fmt4` as SQL: canonical 4-dp double rendering via exact
    * integer math (half-up on `|x|·10⁴+0.5`) — IEEE-identical in both
    * engines, unlike printf `%.4f`. */
  def fmt4Sql(x: String): String = {
    val n = s"CAST(floor(abs($x) * 10000 + 0.5) AS BIGINT)"
    s"""concat(CASE WHEN ($x) < 0 AND $n > 0 THEN '-' ELSE '' END,
       |  CAST($n // 10000 AS VARCHAR), '.',
       |  lpad(CAST($n % 10000 AS VARCHAR), 4, '0'))""".stripMargin
  }

  /** JSON string escape as SQL — mirrors `Fns.jsonEsc` exactly. */
  def jsonEscSql(x: String): String =
    s"""replace(replace(replace($x, '\\', '\\\\'), '"', '\\"'), chr(10), '\\n')"""

  /** `Fns.avgBasket` as SQL: exact half-up cent rounding via integer
    * arithmetic (identical in both engines — `round(double)` is NOT). */
  def avgBasketSql(totalSales: String, count: String): String = {
    val cents = s"CAST(floor((CAST(CAST($totalSales AS DECIMAL(18,4)) * 10000 AS BIGINT) * 2 + $count * 100) / ($count * 200)) AS BIGINT)"
    s"concat(CAST(CAST(floor($cents / 100.0) AS BIGINT) AS VARCHAR), '.', lpad(CAST($cents % 100 AS VARCHAR), 2, '0'))"
  }

  /** Build `WITH cte1, cte2 SELECT ...`. */
  def withCtes(body: String, ctes: String*): String =
    if (ctes.isEmpty) body else s"WITH ${ctes.mkString(",\n")}\n$body"
}
