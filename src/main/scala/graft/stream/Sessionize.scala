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

  /** Streaming form: one state object per user; events extend the open
    * session, and the event-time timeout (watermark-driven) closes it
    * after the gap. Output is one row per CLOSED session — exactly the
    * semantics a batch recompute would give, incrementally.
    */
  def sessionizeStream(events: Dataset[SessionEvent],
                       gapSeconds: Long): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId, evs, state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(ClosedSession(userId, s.n, (s.last - s.start) / 1000L))
          } else {
            val times = evs.map(_.ts.getTime).toSeq.sorted
            val closed = scala.collection.mutable.Buffer[ClosedSession]()
            var cur = state.getOption
            times.foreach { t =>
              cur match {
                case Some(s) if t - s.last <= gapSeconds * 1000L =>
                  cur = Some(s.copy(last = math.max(s.last, t), n = s.n + 1))
                case Some(s) =>
                  closed += ClosedSession(userId, s.n, (s.last - s.start) / 1000L)
                  cur = Some(SessionState(t, t, 1))
                case None =>
                  cur = Some(SessionState(t, t, 1))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.last + gapSeconds * 1000L)
            }
            closed.iterator
          }
      }
  }
}
