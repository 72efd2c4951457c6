package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each event of `leftType`, the most recent event of
  * `rightType` by the same user at or before it (e.g. "the last error
  * before each click").
  *
  * Spark has no ASOF JOIN operator; the naive encodings are a range join
  * (O(n·m) BroadcastNestedLoop — a scale-killer) or a per-left-row
  * correlated subquery. The scale-correct encoding used here is
  * union-and-sweep: tag both sides into ONE stream, sort per user by time,
  * and carry the latest right row forward with a running
  * `last(..., ignoreNulls)` window. Cost: one shuffle on `user_id` + one
  * per-user sort — identical to [[Sessionize]], and at 100 TB it is the
  * standard formulation (both sides scan once, no pair explosion,
  * per-user state bounded by the sort).
  *
  * Determinism: the sweep orders by (ts_us, is_left, event_id) — a right
  * row at EXACTLY the left row's timestamp sorts first and is therefore
  * visible to it ("at or before"), and among equal-timestamp right rows
  * the largest event_id wins. DuckDB's native `ASOF JOIN` has the same
  * at-or-before semantics but unspecified tie order, so the oracle mirrors
  * the sweep itself — same algorithm, same window, both engines.
  */
object AsofJoin {

  /** Output: event_id, user_id, ts_us of each `leftType` event, plus the
    * as-of `rightType` match (asof_event_id, asof_ts_us — null when the
    * user has no prior right event) and lag_us = ts_us − asof_ts_us.
    */
  def asof(
      events: DataFrame,
      leftType: String = "click",
      rightType: String = "error"): DataFrame = {
    val sweep = Window.partitionBy("user_id")
      .orderBy(col("ts_us"), col("is_left"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val rightOnly = (c: org.apache.spark.sql.Column) =>
      when(col("is_left") === 0, c)
    events
      .filter(col("event_type").isin(leftType, rightType))
      .select(
        col("user_id"),
        col("event_id"),
        unix_micros(col("ts")).as("ts_us"),
        when(col("event_type") === leftType, 1).otherwise(0).as("is_left"))
      .withColumn("asof_event_id",
        last(rightOnly(col("event_id")), ignoreNulls = true).over(sweep))
      .withColumn("asof_ts_us",
        last(rightOnly(col("ts_us")), ignoreNulls = true).over(sweep))
      .filter(col("is_left") === 1)
      .select(
        col("event_id"), col("user_id"), col("ts_us"),
        col("asof_event_id"), col("asof_ts_us"),
        (col("ts_us") - col("asof_ts_us")).as("lag_us"))
  }

  /** DuckDB oracle for [[asof]] — the same sweep (DuckDB supports
    * `IGNORE NULLS` in window functions).
    */
  def asofOracleSql(leftType: String = "click", rightType: String = "error"): String =
    s"""WITH t AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |         CASE WHEN event_type = '$leftType' THEN 1 ELSE 0 END AS is_left
       |  FROM events WHERE event_type IN ('$leftType', '$rightType')
       |),
       |j AS (
       |  SELECT user_id, event_id, ts_us, is_left,
       |         last_value(CASE WHEN is_left = 0 THEN event_id END IGNORE NULLS)
       |           OVER w AS asof_event_id,
       |         last_value(CASE WHEN is_left = 0 THEN ts_us END IGNORE NULLS)
       |           OVER w AS asof_ts_us
       |  FROM t
       |  WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, is_left, event_id
       |               ROWS UNBOUNDED PRECEDING)
       |)
       |SELECT event_id, user_id, ts_us, asof_event_id, asof_ts_us,
       |       ts_us - asof_ts_us AS lag_us
       |FROM j WHERE is_left = 1 ORDER BY event_id""".stripMargin
}
