package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class RetentionCohortsSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf001)

  test("matrix matches a driver-side brute-force recompute") {
    val uw = events
      .select(col("user_id"), expr(s"unix_micros(ts) div ${RetentionCohorts.WeekMicros}").as("wk"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val cohort = uw.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val expect = uw
      .map { case (u, w) => (cohort(u), w - cohort(u)) }
      .groupBy(identity).view.mapValues(_.length.toLong).toMap
    val got = RetentionCohorts.matrix(events).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got === expect)
  }

  test("offset-0 rows cover every user exactly once") {
    val out = RetentionCohorts.matrix(events).collect()
    val zeroSum = out.filter(_.getLong(1) == 0L).map(_.getLong(2)).sum
    assert(zeroSum === events.select("user_id").distinct().count())
    assert(out.forall(_.getLong(1) >= 0L), "negative week offset")
  }

  test("plan: distinct collapse happens before the window — no event-sized window input") {
    val plan = RetentionCohorts.matrix(events).queryExecution.executedPlan.toString
    // the window must consume the aggregated (user, week) frame, i.e. an
    // Aggregate sits below the Window in the plan string ordering
    val winIdx = plan.indexOf("Window")
    val aggIdx = plan.lastIndexOf("HashAggregate")
    assert(winIdx >= 0 && aggIdx > winIdx,
      s"no aggregate below the window:\n$plan")
  }
}
