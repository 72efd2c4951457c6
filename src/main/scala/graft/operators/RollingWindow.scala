package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Offset + bounded-frame window analytics over the event stream: per-user
  * inter-event gap (`lag`) and a rolling last-N-events aggregate — the two
  * window shapes every behavioral/telemetry pipeline ships (inter-arrival
  * times for anomaly scoring, short-horizon rolling engagement) and the
  * only Window varieties the declared query set didn't expose (sessionize
  * uses lag internally; the prefix sums use unbounded frames).
  *
  * Scale shape: ONE hash exchange on user_id + per-partition sort — the
  * sessionize plan; both window functions ride the same sorted frame
  * (single Window operator, no second shuffle), and the output is a
  * per-event projection (no row explosion).
  *
  * Cross-engine determinism: the rolling aggregate is an INTEGER sum of
  * value-cents. A double rolling sum would NOT replay — DuckDB evaluates
  * sliding frames with a segment tree, so its floating-point addition
  * ORDER differs from Spark's running accumulation; integer sums are
  * order-free. The rolling mean is then one division of identical longs →
  * bit-identical doubles. Frame order is pinned by (ts_us, event_id) so
  * ties are deterministic.
  */
object RollingWindow {

  /** Rolling frame: current row + this many preceding (4-event window). */
  val Preceding = 3

  /** event_id, user_id, ts_us, val_c, gap_us (null for each user's first
    * event), roll_sum_c, roll_avg_c over the trailing [[Preceding]]+1
    * events.
    */
  def eventsRolling(events: DataFrame, preceding: Int = Preceding): DataFrame = {
    require(preceding >= 0, s"preceding must be >= 0, got $preceding")
    val byUser = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    val frame = byUser.rowsBetween(-preceding, Window.currentRow)
    // no parallelismFloor: the window's hash exchange on user_id
    // redistributes immediately and the pre-exchange work is two scalar
    // projections — a floor repartition would just add a second shuffle
    events
      .select(
        col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"),
        graft.queries.Tables.cents.as("val_c"))
      .withColumn("gap_us", col("ts_us") - lag(col("ts_us"), 1).over(byUser))
      .withColumn("roll_sum_c", sum(col("val_c")).over(frame))
      .withColumn("roll_n", count(lit(1)).over(frame))
      .select(
        col("event_id"), col("user_id"), col("ts_us"), col("val_c"),
        col("gap_us"), col("roll_sum_c"),
        (col("roll_sum_c").cast("double") / col("roll_n").cast("double"))
          .as("roll_avg_c"))
  }

  /** DuckDB oracle — same integer arithmetic, same (ts_us, event_id)
    * frame order.
    */
  def eventsRollingOracleSql(preceding: Int = Preceding): String =
    s"""WITH e AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS ts_us,
       |         CAST(round(value * 100) AS BIGINT) AS val_c
       |  FROM events
       |)
       |SELECT event_id, user_id, ts_us, val_c,
       |       ts_us - lag(ts_us) OVER w AS gap_us,
       |       CAST(sum(val_c) OVER (w ROWS BETWEEN $preceding PRECEDING AND CURRENT ROW)
       |            AS BIGINT) AS roll_sum_c,
       |       CAST(sum(val_c) OVER (w ROWS BETWEEN $preceding PRECEDING AND CURRENT ROW)
       |            AS DOUBLE)
       |         / CAST(count(*) OVER (w ROWS BETWEEN $preceding PRECEDING AND CURRENT ROW)
       |                AS DOUBLE) AS roll_avg_c
       |FROM e
       |WINDOW w AS (PARTITION BY user_id ORDER BY ts_us, event_id)
       |ORDER BY user_id, ts_us, event_id""".stripMargin
}
