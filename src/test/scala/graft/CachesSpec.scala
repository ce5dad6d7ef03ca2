package graft

import org.apache.spark.sql.functions._

/** The shared-persist registry must actually release — the r5
  * "session-lifetime persist without unpersist" leak, pinned. The
  * assertions target THIS suite's own entries via lookupCachedData
  * (other suites share the session and may hold their own caches —
  * e.g. the Graph CC memo — so global cache-manager emptiness is not
  * ours to assert). */
class CachesSpec extends SparkSuite {

  private def cached(df: org.apache.spark.sql.DataFrame): Boolean =
    spark.sharedState.cacheManager.lookupCachedData(
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[_]]).nonEmpty

  test("queries register their shared stages; releaseAll uncaches them") {
    val before = Caches.registered
    // a query whose shared shingle stage goes through the registry
    SparkEntry.queries("dedup_ngram_jaccard")(spark, SparkSuite.Sf001).count()
    assert(Caches.registered > before,
      "query did not register its shared stage")
    val probe = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("event_id")).distinct()
    Caches.shared(probe).count()
    assert(cached(probe), "shared() did not persist")
    Caches.releaseAll()
    assert(Caches.registered == 0)
    assert(!cached(probe), "releaseAll left the registered plan cached")
  }

  test("enforceBudget FIFO-evicts oldest stages until under the ceiling") {
    Caches.releaseAll()
    def mk(c: String) = Tables.events(spark, SparkSuite.Sf0001)
      .select(col(c)).distinct()
    val first = Caches.shared(mk("event_id")); first.count()
    val second = Caches.shared(mk("user_id")); second.count()
    assert(Caches.storageBytes(spark) > 0L)
    // generous ceiling: no-op
    assert(Caches.enforceBudget(spark, Long.MaxValue) == 0)
    assert(cached(first) && cached(second))
    // zero ceiling: everything goes, oldest first, registry drains
    val evicted = Caches.enforceBudget(spark, 0L)
    assert(evicted >= 2, s"expected both stages evicted, got $evicted")
    assert(!cached(first) && !cached(second))
    assert(Caches.registered == 0)
  }

  test("re-registering the same canonical plan is idempotent on release") {
    def mk() = Tables.events(spark, SparkSuite.Sf0001)
      .select(col("user_id")).distinct()
    val a = mk(); val b = mk()
    Caches.shared(a).count()
    Caches.shared(b).count()
    Caches.releaseAll()
    assert(!cached(a) && !cached(b),
      "duplicate registration left the plan cached after release")
  }
}
