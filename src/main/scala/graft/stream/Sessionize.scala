package graft.stream

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Sessionization — gap-based session assignment, in both execution
  * models (SURVEY.md §2.7 ST4 extension):
  *
  *  - batch: pure window functions (lag + running sum of session starts),
  *    SQL-expressible, oracle-checkable;
  *  - streaming: flatMapGroupsWithState with event-time timeout — the
  *    incremental form for unbounded streams, where a session closes when
  *    the watermark passes its gap.
  */
object Sessionize {

  /** Batch form: assign 1-based session ids per user, sessions split at
    * `gapSeconds` of inactivity. Two window passes over the same
    * (user, time) partitioning — one shuffle total.
    */
  def sessionize(events: DataFrame, userCol: String, tsCol: String,
                 tieBreak: String, gapSeconds: Long): DataFrame = {
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieBreak))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val isNew = when(
      unix_micros(col(tsCol)) - unix_micros(lag(col(tsCol), 1).over(w)) >
        gapSeconds * 1000000L, 1L)
      .otherwise(when(lag(col(tsCol), 1).over(w).isNull, 1L).otherwise(0L))
    events.withColumn("session_id", sum(isNew).over(run))
  }

  case class SessionEvent(user_id: Long, ts: java.sql.Timestamp)
  case class SessionState(start: Long, last: Long, n: Int)
  case class ClosedSession(user_id: Long, n_events: Int, duration_s: Long)

  /** Microsecond event time (the corpus precision): Timestamp.getTime is
    * millis — comparing gaps in millis would split sub-millisecond
    * boundaries differently from the batch form's unix_micros math.
    */
  private def micros(ts: java.sql.Timestamp): Long =
    ts.getTime * 1000L + (ts.getNanos / 1000L) % 1000L

  /** Streaming form: one state object per user; events extend the open
    * session, and the event-time timeout (watermark-driven) closes it
    * after the gap. Batch-recompute parity holds whenever cross-batch
    * out-of-orderness stays within the gap (the normal configuration:
    * watermark delay ≤ gap). An event older than the open session's
    * [start − gap] can no longer merge with state that has already been
    * emitted, so it closes immediately as a singleton session — the one
    * documented divergence from a batch recompute, which could still have
    * grouped several such stragglers together.
    */
  def sessionizeStream(events: Dataset[SessionEvent],
                       gapSeconds: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    val gapUs = gapSeconds * 1000000L
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId, s.n, (s.last - s.start) / 1000000L))
          } else {
            val times = evs.map(e => micros(e.ts)).toSeq.sorted
            val closed = scala.collection.mutable.Buffer[ClosedSession]()
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t >= s.start - gapUs && t - s.last <= gapUs =>
                  // within the session's merge interval: extend both ends
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.last, t), s.n + 1))
                case Some(s) if t < s.start - gapUs =>
                  // straggler older than anything this session can absorb
                  closed += ClosedSession(userId, 1, 0L)
                case Some(s) =>
                  closed += ClosedSession(userId, s.n, (s.last - s.start) / 1000000L)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // timeout API is millisecond-based; round up so the session
              // never times out a fraction early
              state.setTimeoutTimestamp((s.last + gapUs + 999L) / 1000L)
            }
            closed.iterator
          }
      }
  }
}
