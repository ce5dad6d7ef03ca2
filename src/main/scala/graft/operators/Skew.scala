package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join (100 TB toolbox): when one join key carries a
  * disproportionate share of the big side, a plain shuffle join puts the
  * whole hot key in one task. Salting spreads it: the big side gets a
  * salt in [0, n), the dimension side is replicated n× with every salt
  * value, and the join keys on (key, salt) — same rows out, n-way
  * parallelism on the hot key. (AQE's skew-join handles the moderate
  * cases automatically; explicit salting is for the pathological ones or
  * for aggregations.)
  */
object Skew {

  /** Semantically identical to `big.join(dim, Seq(key), joinType)` for
    * inner/left joins where `dim` is unique on `key`. */
  def saltedJoin(big: DataFrame, dim: DataFrame, key: String, salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0)
    val salted = big.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until salts).map(lit(_)): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase (partial → final) aggregation for skewed group keys:
    * group once on (key, salt) — map-side combine splits the hot key
    * across tasks — then re-aggregate on key. `sum` shown; any
    * re-aggregable aggregate fits the shape. */
  def saltedSumByKey(df: DataFrame, key: String, valueCol: String,
      salts: Int): DataFrame = {
    df.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(sum(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(sum(col("__partial")).as(s"sum_$valueCol"))
  }
}
