package graft

import org.apache.spark.sql.functions._
import graft.SparkSuite.Sf001

/** Live JDBC round-trip for the `src_jdbc_*` source patterns
  * (operators/Inventory.scala) — the reference's ACTUAL source is a
  * Postgres database reached through Prisma
  * (/root/reference/src/queries.ts:12-35,56-122); the oracled queries
  * model that as pushdown-shaped reads over the parquet views. This
  * spec closes the fidelity gap with an EMBEDDED Derby database (ships
  * with Spark, in-JVM, zero egress): load the till view into a real
  * table with `spark.write.jdbc`, read it back with `spark.read.jdbc`,
  * and prove
  *
  *  1. the date predicate reaches the DATABASE (PushedFilters on the
  *     JDBCRelation scan — at 100 TB-of-OLTP scale the difference
  *     between one index probe and a full-table ship), and
  *  2. the JDBC read is row-identical to the parquet-modeled twin
  *     `src_jdbc_lookup`, so the modeled queries and a real database
  *     deployment are interchangeable.
  */
class JdbcSpec extends SparkSuite {

  private lazy val url: String = {
    // keep Derby's home (lock files, derby.log) out of the repo cwd
    val home = java.nio.file.Files.createTempDirectory("graft_derby_")
    System.setProperty("derby.system.home", home.toString)
    s"jdbc:derby:$home/graftdb;create=true"
  }
  private val Driver = "org.apache.derby.jdbc.EmbeddedDriver"
  private val Table = "till_totals"

  private def props: java.util.Properties = {
    val p = new java.util.Properties()
    p.setProperty("driver", Driver)
    p
  }

  private lazy val loaded: Unit = {
    Tables.tillTotals(spark, Sf001)
      .write.mode("overwrite").option("driver", Driver)
      .jdbc(url, Table, props)
  }

  test("spark.read.jdbc: date predicate pushes into the Derby scan") {
    loaded
    val df = spark.read.option("driver", Driver).jdbc(url, Table, props)
      .filter(col("date") === "1995-01-04")
      .select("date", "customerCount", "totalSales", "totalGst",
        "orderCount")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("JDBCRelation"), "not a JDBC scan:\n" + plan.take(600))
    assert(plan.contains("PushedFilters") &&
      plan.contains("EqualTo(date,1995-01-04)"),
      "date predicate did not reach the database:\n" + plan.take(900))
    // projection pruning ships only the 5 needed columns to the driver
    assert(!plan.contains("totalRounding"),
      "unprojected column survives into the JDBC scan:\n" + plan.take(900))
  }

  test("JDBC read ≡ the parquet-modeled src_jdbc_lookup twin") {
    loaded
    val viaJdbc = spark.read.option("driver", Driver).jdbc(url, Table, props)
      .filter(col("date") === "1995-01-04")
      .select(col("date"), col("customerCount"),
        col("totalSales").cast("double").as("totalSales"),
        col("totalGst").cast("double").as("totalGst"), col("orderCount"))
      .collect().map(_.toSeq).toSeq
    val modeled = SparkEntry.queries("src_jdbc_lookup")(spark, Sf001)
      .collect().map(_.toSeq).toSeq
    assert(viaJdbc.nonEmpty, "fixture date missing from the till view")
    assert(viaJdbc == modeled,
      s"JDBC and modeled twin diverge:\n  jdbc=$viaJdbc\n  model=$modeled")
  }

  test("numRows partitioned read: predicated COUNT matches, proving the " +
      "partition column split covers the table exactly once") {
    loaded
    // the parallel-read form a real deployment uses: partitionColumn
    // splits the table into N non-overlapping ranges, one task each
    val base = Tables.tillTotals(spark, Sf001)
    val n = base.count()
    val lo = base.agg(min(col("orderCount"))).head().getLong(0)
    val hi = base.agg(max(col("orderCount"))).head().getLong(0)
    val parallel = spark.read
      .option("driver", Driver)
      .option("partitionColumn", "orderCount")
      .option("lowerBound", lo.toString)
      .option("upperBound", (hi + 1).toString)
      .option("numPartitions", "4")
      .jdbc(url, Table, props)
    assert(parallel.rdd.getNumPartitions == 4,
      s"expected 4 JDBC range partitions, got ${parallel.rdd.getNumPartitions}")
    assert(parallel.count() == n,
      "range-partitioned JDBC read lost or duplicated rows")
  }
}
