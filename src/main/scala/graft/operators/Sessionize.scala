package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gap-based sessionization of the event stream: consecutive events of the
  * same user belong to one session while the inter-event gap stays within
  * `gapUs`; a larger gap (or the user's first event) opens a new session.
  *
  * Scale design (100 TB): ONE shuffle, on `user_id`. Both window passes
  * (the `lag` gap tag and the running `sum` session counter) share the same
  * partitioning and ordering, so Catalyst plans them over a single
  * Exchange+Sort, and the per-session roll-up reuses the same partitioning
  * (`HashPartitioning(user_id)` satisfies the `(user_id, session_id)`
  * clustering — all rows of a session share the user), so the final
  * aggregate is shuffle-free. Per-user state is bounded by that user's
  * event count; skewed power-users are bounded by the window sort, not by
  * any driver state. The streaming twin of this shape is
  * `flatMapGroupsWithState` with an event-time timeout
  * ([[graft.streaming.StreamingDedup]] shows the state plumbing).
  *
  * Timestamps are carried as epoch MICROS (`unix_micros`) — integer
  * arithmetic end to end, exactly reproducible in the DuckDB oracle via
  * `epoch_us(ts)` (the nanos→micros truncation happens once in
  * [[graft.queries.Tables.events]]).
  */
object Sessionize {

  /** 30 minutes — the classic web-analytics session gap. */
  val GapUs: Long = 30L * 60L * 1000000L

  /** One row per (user, session): event count, span, duration.
    * Output: user_id, session_id (1-based per user), n_events, start_us,
    * end_us, dur_us.
    */
  def sessions(events: DataFrame, gapUs: Long = GapUs): DataFrame = {
    val byUser = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
    val running = byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // first event of a user: lag is null, null <= gap is null → otherwise(1)
    val tagged = events
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("new_s",
        when(col("ts_us") - lag(col("ts_us"), 1).over(byUser) <= gapUs, 0L)
          .otherwise(1L))
      .withColumn("session_id", sum(col("new_s")).over(running))
    tagged
      .groupBy(col("user_id"), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("start_us"),
        max(col("ts_us")).as("end_us"))
      .withColumn("dur_us", col("end_us") - col("start_us"))
  }

  /** DuckDB oracle for [[sessions]] — same algorithm, same window frames.
    * DuckDB's windowed `sum` over integers returns HUGEINT, hence the
    * BIGINT casts.
    */
  def sessionsOracleSql(gapUs: Long = GapUs): String =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us FROM events
       |),
       |tagged AS (
       |  SELECT user_id, event_id, ts_us,
       |         CASE WHEN ts_us - lag(ts_us) OVER w <= $gapUs THEN 0 ELSE 1 END AS new_s
       |  FROM e
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
       |),
       |sess AS (
       |  SELECT user_id, ts_us,
       |         CAST(sum(new_s) OVER (
       |           PARTITION BY user_id ORDER BY ts_us, event_id
       |           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
       |  FROM tagged
       |)
       |SELECT user_id, session_id, count(*) AS n_events,
       |       min(ts_us) AS start_us, max(ts_us) AS end_us,
       |       max(ts_us) - min(ts_us) AS dur_us
       |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
