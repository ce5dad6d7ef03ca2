package graft

import org.apache.spark.sql.functions._

/** The shared-persist registry must actually release: after a query
  * that routes its shared stages through Caches.shared runs and
  * releaseAll() fires, the session's cache manager holds nothing —
  * the r5 "session-lifetime persist without unpersist" leak, pinned. */
class CachesSpec extends SparkSuite {

  test("shared() persists, releaseAll() empties the cache manager") {
    // run a query whose shared shingle stage goes through the registry
    SparkEntry.queries("dedup_ngram_jaccard")(spark, SparkSuite.Sf001).count()
    assert(Caches.registered > 0, "query did not register its shared stage")
    assert(!spark.sharedState.cacheManager.isEmpty,
      "shared stage was not actually persisted")
    Caches.releaseAll()
    assert(Caches.registered == 0)
    assert(spark.sharedState.cacheManager.isEmpty,
      "releaseAll left cached plans behind")
  }

  test("re-registering the same canonical plan is idempotent on release") {
    val df = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("user_id")).distinct()
    Caches.shared(df).count()
    Caches.shared(Tables.events(spark, SparkSuite.Sf0001)
      .select(col("user_id")).distinct()).count()
    Caches.releaseAll()
    assert(spark.sharedState.cacheManager.isEmpty)
  }
}
