package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful sessionization via `flatMapGroupsWithState` — the
  * escape hatch for session semantics `session_window` can't express
  * (here: sessions additionally close after MAX_EVENTS events, the
  * kind of business rule that forces custom state).
  *
  * State design for scale: state per user_id is O(1) (running
  * aggregates only, never the event list); event-time timeout bounds
  * state lifetime so the store can't grow unboundedly on 100 TB/day of
  * events; output is emitted incrementally as sessions close.
  */
object StatefulSession {

  case class Event(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class SessionState(start: Long, lastTs: Long, n: Int, sum: Double)
  case class SessionOut(user_id: Long, session_start: java.sql.Timestamp,
                        session_end: java.sql.Timestamp, n_events: Int,
                        sum_value: Double, closed_by: String)

  val GapMs: Long = 5 * 60 * 1000L
  val MaxEvents: Int = 100

  /** Streaming-or-batch sessionize: gap-closed like session_window,
    * plus a max-events cap. Works on a `Dataset[Event]` grouped by
    * user; in streaming mode pair with
    * `.withWatermark("ts", ...)` and OutputMode.Append.
    */
  def sessionize(events: Dataset[Event]): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[List[SessionState], SessionOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, it: Iterator[Event], state: GroupState[List[SessionState]]) =>
          if (state.hasTimedOut) {
            val out = state.getOption.toList.flatten
              .map(s => close(userId, s, "timeout"))
            state.remove()
            out.iterator
          } else {
            // Sort within the micro-batch (Spark hands events unordered).
            val sorted = it.toSeq.sortBy(_.ts.getTime)
            var open = state.getOption.flatMap(_.headOption)
            val closed = List.newBuilder[SessionOut]
            sorted.foreach { e =>
              val t = e.ts.getTime
              open match {
                case Some(s) if t - s.lastTs <= GapMs && s.n < MaxEvents =>
                  open = Some(s.copy(lastTs = t, n = s.n + 1, sum = s.sum + e.value))
                case Some(s) =>
                  closed += close(userId, s,
                    if (s.n >= MaxEvents) "max_events" else "gap")
                  open = Some(SessionState(t, t, 1, e.value))
                case None =>
                  open = Some(SessionState(t, t, 1, e.value))
              }
            }
            open match {
              case Some(s) =>
                state.update(List(s))
                state.setTimeoutTimestamp(s.lastTs + GapMs)
              case None => // no events this batch; keep state as-is
            }
            closed.result().iterator
          }
      }
  }

  private def close(userId: Long, s: SessionState, reason: String): SessionOut =
    SessionOut(userId, new java.sql.Timestamp(s.start),
      new java.sql.Timestamp(s.lastTs + GapMs), s.n, s.sum, reason)
}
