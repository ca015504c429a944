package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** X5 in streaming form: gap-based sessionization with custom state —
  * `flatMapGroupsWithState` over the keyed stream, the Structured
  * Streaming twin of [[graft.ops.Sessionize]] (same gap rule, same
  * output shape).
  *
  * State per key is ONE open session (start, last-seen, count) — bytes,
  * not events. A micro-batch folds its events into the open session in
  * event-time order, emitting every session it closes; the final close
  * happens via event-time timeout when the watermark passes last-seen +
  * gap, so memory is bounded by key cardinality and late data inside the
  * watermark still extends the right session. This is the 100 TB shape:
  * state scales with ACTIVE keys, shuffles carry (key, ts) pairs only,
  * and emission is append-mode (sink-friendly).
  */
object SessionStream {

  case class OpenSession(startMs: Long, lastMs: Long, n: Long)
  case class SessionOut(key: String, start_ts: Timestamp, end_ts: Timestamp,
                        n_events: Long, duration_ms: Long)

  private def close(key: String, s: OpenSession): SessionOut =
    SessionOut(key, new Timestamp(s.startMs), new Timestamp(s.lastMs),
      s.n, s.lastMs - s.startMs)

  /** @param events streaming frame with a string-able key column and a
    *   timestamp column
    */
  def sessions(events: DataFrame, keyCol: String, tsCol: String,
               gapSecs: Long): Dataset[SessionOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapSecs * 1000L

    val typed = events
      .select(col(keyCol).cast("string").as("k"), col(tsCol).cast("timestamp").as("t"))
      .withWatermark("t", s"$gapSecs seconds")
      .as[(String, Timestamp)]

    typed.groupByKey(_._1).flatMapGroupsWithState[OpenSession, SessionOut](
      OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
      case (key, rows, state: GroupState[OpenSession]) =>
        if (state.hasTimedOut) {
          val out = close(key, state.get)
          state.remove()
          Iterator(out)
        } else {
          val times = rows.map(_._2.getTime).toArray.sorted
          var open = state.getOption
          val closed = Seq.newBuilder[SessionOut]
          times.foreach { ms =>
            open match {
              case Some(s) if ms - s.lastMs <= gapMs =>
                open = Some(OpenSession(s.startMs, math.max(s.lastMs, ms), s.n + 1))
              case Some(s) =>
                closed += close(key, s)
                open = Some(OpenSession(ms, ms, 1))
              case None =>
                open = Some(OpenSession(ms, ms, 1))
            }
          }
          open.foreach { s =>
            state.update(s)
            state.setTimeoutTimestamp(s.lastMs + gapMs)
          }
          closed.result().iterator
        }
    }
  }
}
