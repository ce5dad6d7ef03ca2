package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability: a named DataFrame query over a testdata dir,
  * plus (when SQL-expressible) the ANSI SQL a DuckDB oracle runs on the
  * same parquet tables. Column names/types must match the oracle exactly
  * (the driver sorts columns by name and hash-compares values).
  */
final case class Q(
    name: String,
    run: (SparkSession, String) => DataFrame,
    oracle: Option[String]
)

object Q {
  /** SQL-checked query. */
  def apply(name: String, sql: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, Some(sql))
  /** Rows-only checked query (not expressible in DuckDB SQL). */
  def noOracle(name: String)(run: (SparkSession, String) => DataFrame): Q =
    Q(name, run, None)
}
