package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered conversion funnel: how many users performed view → click →
  * purchase IN THAT TEMPORAL ORDER — the classic product-analytics
  * sequence query (each stage must happen strictly AFTER the user's
  * earliest qualifying previous stage).
  *
  * Semantics: t1 = user's earliest 'view'; t2 = earliest 'click' with
  * ts > t1; t3 = earliest 'purchase' with ts > t2. Stage rows report the
  * user count that reached each depth. Strictly-greater comparisons on
  * integer epoch micros (the operators' time convention) — equal-timestamp
  * events do NOT satisfy the next stage, replayed identically in SQL.
  *
  * Scale design (100 TB): the naive spelling sorts every user's full event
  * history through one window. Here each stage is a filtered partial-
  * aggregating `groupBy(user_id).min(ts)` joined to the previous stage's
  * (user, t) frame — the frames SHRINK monotonically down the funnel, the
  * joins are user-keyed hash joins (AQE broadcasts the lower stages once
  * they fit), and no per-user ordered scan ever materializes. Three stage
  * rows out, constant-size result.
  */
object SequenceFunnel {

  val Stages = Seq("view", "click", "purchase")

  /** (stage, n_users): stage labels are depth-prefixed so lexical ordering
    * is funnel ordering.
    */
  def funnel(events: DataFrame): DataFrame = {
    val e = graft.queries.Tables.parallelismFloor(events)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("ts_us"))
    def stage(eventType: String, prev: Option[DataFrame]): DataFrame = {
      val base = e.filter(col("event_type") === eventType)
      val gated = prev match {
        case None => base
        case Some(p) =>
          base.join(p.withColumnRenamed("t", "t_prev"), Seq("user_id"))
            .filter(col("ts_us") > col("t_prev"))
      }
      gated.groupBy("user_id").agg(min(col("ts_us")).as("t"))
    }
    var prev: Option[DataFrame] = None
    val counts = Stages.zipWithIndex.map { case (st, i) =>
      val cur = stage(st, prev)
      prev = Some(cur)
      cur.agg(count(lit(1)).as("n_users"))
        .select(lit(s"${i + 1}_$st").as("stage"), col("n_users"))
    }
    counts.reduce(_ unionAll _)
  }

  def funnelOracleSql: String =
    s"""WITH s1 AS (
       |  SELECT user_id, min(epoch_us(ts)) AS t
       |  FROM events WHERE event_type = 'view' GROUP BY user_id
       |),
       |s2 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
       |  FROM events e JOIN s1 ON e.user_id = s1.user_id AND epoch_us(e.ts) > s1.t
       |  WHERE e.event_type = 'click' GROUP BY e.user_id
       |),
       |s3 AS (
       |  SELECT e.user_id, min(epoch_us(e.ts)) AS t
       |  FROM events e JOIN s2 ON e.user_id = s2.user_id AND epoch_us(e.ts) > s2.t
       |  WHERE e.event_type = 'purchase' GROUP BY e.user_id
       |)
       |SELECT stage, n_users FROM (
       |  SELECT '1_view' AS stage, count(*) AS n_users FROM s1
       |  UNION ALL SELECT '2_click', count(*) FROM s2
       |  UNION ALL SELECT '3_purchase', count(*) FROM s3
       |) ORDER BY stage""".stripMargin
}
