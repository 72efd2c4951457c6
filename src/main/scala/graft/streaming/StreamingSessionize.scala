package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of [[graft.operators.Sessionize]]: gap-based sessions as
  * `flatMapGroupsWithState` keyed state — the canonical Structured
  * Streaming sessionization shape.
  *
  * Per user the state is ONE open session (first/last timestamp, event
  * count, 1-based session index): events within `gapUs` of the session's
  * tail extend it; a bigger gap CLOSES it (emitting one output row — append
  * mode, each session exactly once) and opens the next. An event-time
  * timeout at `last + gap` flushes the final open session once the
  * watermark passes the point where any event could still extend it — so
  * emitted sessions are FINAL under the watermark contract, and state per
  * user is a constant-size record regardless of stream length (the 100 TB
  * property; contrast a groupBy over the full history, whose state grows
  * with the data).
  *
  * Batch⊃streaming equivalence: for in-watermark data the emitted rows are
  * exactly the batch operator's (pinned by StreamingSessionizeSpec across
  * multiple triggers); late events beyond the watermark are dropped by the
  * engine — the standard streaming trade the batch path doesn't make.
  */
object StreamingSessionize {

  /** `ts` carries the event-time watermark METADATA through to the
    * stateful operator — Spark's UnsupportedOperationChecker rejects an
    * event-time timeout unless a watermarked column survives into the
    * `flatMapGroupsWithState` child, so it must ride along even though the
    * sweep itself only reads the pre-computed integer `ts_us`.
    */
  final case class SessEvent(
      user_id: Long, event_id: Long, ts: java.sql.Timestamp, ts_us: Long)
  /** Per-user state. `n == 0` is the TOMBSTONE form: no session open, but
    * `idx` remembers the next session number — a timeout flush must NOT
    * `state.remove()`, or the user's numbering would restart at 1 when
    * their next event arrives (observed: duplicate session_ids across
    * triggers). A tombstone sets no new timeout, so it is never re-fired;
    * state stays one constant-size record per user either way.
    */
  final case class OpenSession(idx: Long, start: Long, last: Long, n: Long)
  final case class ClosedSession(
      user_id: Long, session_id: Long, n_events: Long,
      start_us: Long, end_us: Long, dur_us: Long)

  /** Closed sessions from a streaming events frame (needs `user_id`,
    * `event_id`, and an event-time `ts`; watermark must be set by the
    * caller so the event-time timeout has a clock to run against).
    */
  def sessions(
      spark: SparkSession,
      events: DataFrame,
      gapUs: Long = graft.operators.Sessionize.GapUs): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .select(col("user_id"), col("event_id"), col("ts"),
        unix_micros(col("ts")).as("ts_us"))
      .as[SessEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (user: Long, rows: Iterator[SessEvent], state: GroupState[OpenSession]) =>
          val closed = scala.collection.mutable.ArrayBuffer.empty[ClosedSession]
          def close(s: OpenSession): Unit =
            closed += ClosedSession(user, s.idx, s.n, s.start, s.last, s.last - s.start)
          if (state.hasTimedOut) {
            // watermark passed last+gap: nothing can extend this session.
            // Flush it and leave a tombstone carrying the next index.
            state.getOption.filter(_.n > 0).foreach { s =>
              close(s)
              state.update(OpenSession(s.idx + 1, 0L, 0L, 0L))
            }
          } else {
            // a micro-batch delivers its group unsorted; order restores the
            // sweep. Batch size bounds the sort, not stream length.
            var st = state.getOption.getOrElse(OpenSession(1, 0L, 0L, 0L))
            rows.toSeq.sortBy(e => (e.ts_us, e.event_id)).foreach { e =>
              st match {
                case s if s.n == 0 =>
                  st = OpenSession(s.idx, e.ts_us, e.ts_us, 1)
                case s if e.ts_us - s.last <= gapUs =>
                  st = s.copy(last = e.ts_us, n = s.n + 1)
                case s =>
                  close(s)
                  st = OpenSession(s.idx + 1, e.ts_us, e.ts_us, 1)
              }
            }
            state.update(st)
            if (st.n > 0)
              // CEILING of (last + gap) in ms, computed on the SUM — the
              // per-term floor spelling `last/1000 + gap/1000` truncated
              // up to ~2 ms, firing the timeout while the watermark was
              // still below last+gapUs (an on-time extending event then
              // found its session already flushed — one session emitted
              // as two, diverging from the batch sweep), and for
              // gapUs < 1000 could compute a timestamp at or below the
              // current watermark, which setTimeoutTimestamp rejects
              state.setTimeoutTimestamp((st.last + gapUs + 999L) / 1000L)
          }
          closed.iterator
      }
  }

  /** BATCH REPLAY of the streaming sweep (the `events_windowed_u10`
    * pattern, VERDICT r13 item 5): the SAME [[sessions]] call — same
    * lambda, same state machine — run over the batch events frame, so the
    * sweep's gap/close/numbering logic gets an oracle-gated CORRECTNESS
    * row (the batch operator's `sessionsOracleSql` — identical schema).
    *
    * Batch execution never fires group-state timeouts (GroupStateImpl
    * .createForBatch has no clock; `setTimeoutTimestamp` is legal but
    * inert), so each user's FINAL open session would be silently dropped.
    * A per-user SENTINEL event at `max(ts) + gap + 1µs` — strictly beyond
    * any event that could extend the last real session — forces the sweep
    * to close it; the sentinel's own 1-event session is the only state
    * left open at end-of-group and is never emitted. The emitted frame is
    * therefore exactly the batch operator's full session set.
    * StreamingSessionizeSpec separately pins the TRIGGERED streaming run
    * (watermark-flushed) row-identical to the batch operator, closing the
    * loop: stream ≡ batch ≡ oracle.
    */
  def sessionsBatchReplay(
      spark: SparkSession,
      events: DataFrame,
      gapUs: Long = graft.operators.Sessionize.GapUs): DataFrame = {
    val ev = events.select(col("user_id"), col("event_id"), col("ts"))
    val sentinels = ev
      .groupBy(col("user_id"))
      .agg(timestamp_micros(unix_micros(max(col("ts"))) + gapUs + 1L).as("ts"))
      .select(col("user_id"), lit(-1L).as("event_id"), col("ts"))
    sessions(spark, ev.unionByName(sentinels), gapUs).toDF()
  }
}
