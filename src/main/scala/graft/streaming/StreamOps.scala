package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming variants of the engine's event operators
  * (SURVEY §7.6 — engine extension; the reference itself has no streams).
  *
  * Batch/stream parity: `windowedCounts` is the streaming form of
  * `ev_hour_agg` (tumbling window + watermark instead of date_trunc), and
  * `sessionize` is the streaming form of `ev_sessionize` (explicit
  * per-user state machine + processing-time-independent event-time gaps
  * instead of a lag window). Both run identically on a bounded batch via
  * the same transformations — specs exercise them through MemoryStream.
  */
object StreamOps {

  case class Event(event_id: Long, ts: Timestamp, user_id: Long, event_type: String, value: Double)
  case class SessionState(sessionId: Long, lastTs: Long, count: Long)
  case class SessionUpdate(user_id: Long, session_id: Long, n_events: Long, closed: Boolean)

  /** Tumbling event-time window counts with a watermark bounding state.
    * At scale the watermark is what keeps state finite: without it every
    * window lives forever in the state store.
    */
  def windowedCounts(
      events: DataFrame,
      windowLength: String = "1 hour",
      watermark: String = "2 hours"
  ): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), windowLength).as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("w.start").as("window_start"), col("event_type"), col("cnt"), col("sum_value"))

  /** Gap-based sessionization with explicit keyed state
    * (`flatMapGroupsWithState`): a session closes when no event arrives
    * within `gapSeconds` of the previous one (event time). Emits one
    * update row per processed batch per open session and a closing row on
    * timeout. State per user is O(1) — (sessionId, lastTs, count) — so
    * state size grows with |active users|, not |events|.
    */
  def sessionize(
      events: Dataset[Event],
      gapSeconds: Long = 1800L,
      watermark: String = "2 hours"
  ): Dataset[SessionUpdate] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark) // event-time timeout needs a watermark
      .as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionUpdate](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(SessionUpdate(userId, s.sessionId, s.count, closed = true))
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            var s = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
            val out = Seq.newBuilder[SessionUpdate]
            sorted.foreach { e =>
              val t = e.ts.getTime
              if (s.lastTs != Long.MinValue && t - s.lastTs > gapSeconds * 1000L) {
                out += SessionUpdate(userId, s.sessionId, s.count, closed = true)
                s = SessionState(s.sessionId + 1L, t, 1L)
              } else {
                s = SessionState(s.sessionId, t, s.count + 1L)
              }
            }
            state.update(s)
            if (state.getCurrentWatermarkMs() > 0) {
              state.setTimeoutTimestamp(s.lastTs + gapSeconds * 1000L)
            }
            out += SessionUpdate(userId, s.sessionId, s.count, closed = false)
            out.result().iterator
          }
      }
  }
}
