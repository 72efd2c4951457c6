package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Percentile winsorization — clip a metric to its per-group [p01, p99]
  * band (the outlier-taming step before any mean-based monitoring or
  * model feature is trusted; clipping beats dropping because row counts
  * and join keys survive).
  *
  * Two-pass shape, both passes group-keyed: the threshold table is one
  * exact-percentile aggregate per group (group-count rows — broadcast-
  * sized however large the fact is), joined back as a broadcast so the
  * clip itself is scan-fused: `greatest(lo, least(hi, value))` inside
  * whole-stage codegen, no second shuffle of the fact. Values pass
  * through UNCHANGED unless clipped — no arithmetic on the doubles — and
  * the thresholds are the same interpolated percentiles the
  * `events_quantiles` oracle already hash-matches, so the whole output
  * replays in DuckDB.
  */
object Winsorize {

  /** (event_id, event_type, value, value_w) with value_w clipped to the
    * group's [p01, p99].
    */
  def clipped(events: DataFrame): DataFrame = {
    val thr = events
      .groupBy(col("event_type"))
      .agg(
        percentile(col("value"), lit(0.01)).as("lo"),
        percentile(col("value"), lit(0.99)).as("hi"))
    events
      .join(broadcast(thr), Seq("event_type"))
      .select(
        col("event_id"), col("event_type"), col("value"),
        // the null guard matters: least/greatest SKIP nulls in both
        // engines (least(hi, NULL) = hi), so without it a NULL metric
        // would be silently fabricated as the group's p99 — a bias no
        // oracle gate could catch because DuckDB clips identically
        when(col("value").isNull, lit(null))
          .otherwise(greatest(col("lo"), least(col("hi"), col("value"))))
          .as("value_w"))
      .orderBy(col("event_id"))
  }

  /** DuckDB oracle for [[clipped]]. */
  def clippedOracleSql: String =
    s"""WITH thr AS (
       |  SELECT event_type,
       |         quantile_cont(value, 0.01) AS lo,
       |         quantile_cont(value, 0.99) AS hi
       |  FROM events GROUP BY 1
       |)
       |SELECT event_id, e.event_type, value,
       |       CASE WHEN value IS NULL THEN NULL
       |            ELSE greatest(lo, least(hi, value)) END AS value_w
       |FROM events e JOIN thr ON e.event_type = thr.event_type
       |ORDER BY event_id""".stripMargin
}
