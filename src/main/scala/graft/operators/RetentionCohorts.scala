package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retention cohort matrix — the classic product-analytics triangle: users
  * bucketed by their FIRST-activity week (the cohort), counted in every
  * later week they return, as (cohort_week, week_offset, n_users).
  *
  * Weeks are integer epoch-week ordinals (`unix_micros div 604800·10⁶`) —
  * one integer division both engines replay identically (the operators'
  * integer-time convention; calendar `date_trunc('week')` alignment adds
  * nothing for cohort arithmetic and drags in engine week-start rules).
  *
  * Scale shape: (user, week) pairs are distinct-collapsed FIRST (partial
  * map-side — a user's thousandth event this week dies in the mapper), so
  * everything downstream is bounded by users × active-weeks, not events.
  * The cohort week rides a user-partitioned window min — the same
  * user_id exchange that the distinct's final aggregation needs anyway,
  * not a separate join — and the matrix is one (cohort, offset) hash
  * aggregate whose result is bounded by weeks², independent of corpus
  * size.
  */
object RetentionCohorts {

  val WeekMicros = 604800000000L

  /** (cohort_week, week_offset, n_users), offsets 0-based; every user
    * appears in their cohort's offset-0 row by construction.
    */
  def matrix(events: DataFrame): DataFrame = {
    val uw = events
      .select(col("user_id"), expr(s"unix_micros(ts) div $WeekMicros").as("wk"))
      .distinct()
    val withCohort = uw
      .withColumn("cohort", min(col("wk")).over(Window.partitionBy("user_id")))
    withCohort
      .groupBy(col("cohort").as("cohort_week"),
        (col("wk") - col("cohort")).as("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy("cohort_week", "week_offset")
  }

  /** DuckDB oracle for [[matrix]]. */
  def matrixOracleSql: String =
    s"""WITH uw AS (
       |  SELECT DISTINCT user_id, epoch_us(ts) // $WeekMicros AS wk FROM events
       |),
       |f AS (SELECT user_id, wk,
       |             min(wk) OVER (PARTITION BY user_id) AS cohort
       |      FROM uw)
       |SELECT cohort AS cohort_week, wk - cohort AS week_offset,
       |       count(*) AS n_users
       |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
