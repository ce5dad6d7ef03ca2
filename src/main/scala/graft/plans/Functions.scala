package graft.plans

import org.apache.spark.sql.SparkSession

/** One-stop registration of every custom SQL function this engine
  * defines, called from each first-party session factory (Verify,
  * Bench, Explain, the shared test session).
  *
  * Why it exists: [[graft.operators.Vectors]]' `dot`/`pqDist` helpers
  * register `vector_dot`/`vector_sqdist` lazily at Column-construction
  * time via `SparkSession.getActiveSession`. That works when the
  * building thread's active session IS the executing session, but a
  * thread pool or a second session can leave the executing session
  * without the registration (UNRESOLVED_ROUTINE at analysis). Eagerly
  * registering here makes every first-party entry point immune; the
  * lazy per-Column registration remains as a fallback for ad-hoc
  * sessions built by external callers. Registration is idempotent
  * (`createOrReplaceTempFunction`), so doing both costs nothing.
  */
object Functions {
  def registerAll(spark: SparkSession): Unit = {
    VectorDot.register(spark)
    VectorSqDist.register(spark)
    VectorL2Sq.register(spark)
  }
}
