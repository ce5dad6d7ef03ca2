package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.GroupState

/** Event-stream sessionization — the custom-state streaming operator
  * (`KeyValueGroupedDataset.flatMapGroupsWithState`, SURVEY §2.10
  * extension): events within `gapMinutes` of each other belong to one
  * session per user. The same `split` kernel backs the batch window-SQL
  * form (`win_sessionize` query) and the stateful streaming form, and
  * tests assert they agree.
  */
object Sessionize {

  final case class Ev(user_id: Long, tsMicros: Long, value: Double)
  final case class SessionOut(user_id: Long, start_us: Long, end_us: Long,
      n: Long, total: Double)

  /** Pure kernel: sorted events of ONE user → closed sessions. */
  def split(events: Seq[Ev], gapMicros: Long): Seq[SessionOut] = {
    if (events.isEmpty) return Nil
    val sorted = events.sortBy(_.tsMicros)
    val out = Seq.newBuilder[SessionOut]
    var start = sorted.head.tsMicros
    var last = start
    var n = 0L
    var total = 0.0
    sorted.foreach { e =>
      if (e.tsMicros - last > gapMicros) {
        out += SessionOut(e.user_id, start, last, n, total)
        start = e.tsMicros; n = 0L; total = 0.0
      }
      last = e.tsMicros; n += 1; total += e.value
    }
    out += SessionOut(sorted.head.user_id, start, last, n, total)
    out.result()
  }

  /** Stateful streaming/batch form. In a stream, open sessions live in
    * `GroupState` across micro-batches and close on the event-time gap;
    * in batch each group arrives complete, so the state path reduces to
    * the kernel. */
  def flatSessions(spark: SparkSession, events: Dataset[Ev],
      gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    val gapMicros = gapMinutes.toLong * 60 * 1000000
    events.groupByKey(_.user_id)
      .flatMapGroups { (_: Long, it: Iterator[Ev]) =>
        split(it.toSeq, gapMicros).iterator
      }
  }

  /** The streaming-native variant: carry the open tail of each user's
    * session in state between micro-batches. */
  def statefulSessions(spark: SparkSession, events: Dataset[Ev],
      gapMinutes: Int): Dataset[SessionOut] = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gapMicros = gapMinutes.toLong * 60 * 1000000
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[Ev], SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout()) {
        (_: Long, it: Iterator[Ev], state: GroupState[List[Ev]]) =>
          val buffered = state.getOption.getOrElse(Nil) ++ it.toList
          if (buffered.isEmpty) Iterator.empty
          else {
            val sessions = split(buffered, gapMicros)
            // keep the open tail session in state, emit the closed ones
            val closed = sessions.dropRight(1)
            val tailStart = sessions.last.start_us
            state.update(buffered.filter(_.tsMicros >= tailStart))
            closed.iterator
          }
      }
  }
}
