package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Window-function operators ([[Sessionize]], [[GroupTopK]], [[AsofJoin]])
  * against independent brute-force recomputations, plus the plan-shape
  * properties their 100 TB arguments rest on: one shuffle for the whole
  * sessionize pipeline, and the `WindowGroupLimit` partial top-k rewrite
  * for rank-filtered windows.
  */
class WindowOpsSpec extends SparkSpec {

  private lazy val events: Array[(Long, Long, Long, String)] =
    Tables.events(spark, sf001)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
        col("user_id"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))

  test("sessions match a brute-force per-user sweep") {
    val got = Sessionize.sessions(Tables.events(spark, sf001))
      .orderBy("user_id", "session_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    val expected = events
      .groupBy(_._3).toSeq.sortBy(_._1)
      .flatMap { case (user, evs) =>
        val sorted = evs.sortBy(e => (e._2, e._1)).map(_._2)
        // walk the timeline, cutting on gaps > 30 min
        val sessions = sorted.foldLeft(List.empty[List[Long]]) {
          case (Nil, ts) => List(List(ts))
          case (cur :: done, ts) if ts - cur.head <= Sessionize.GapUs =>
            (ts :: cur) :: done
          case (acc, ts) => List(ts) :: acc
        }.reverse.map(_.reverse)
        sessions.zipWithIndex.map { case (tss, i) =>
          (user, (i + 1).toLong, tss.size.toLong, tss.min, tss.max, tss.max - tss.min)
        }
      }
    assert(got.toSeq == expected)
  }

  test("sessionize executes with exactly one shuffle") {
    // string-count, not collect: AdaptiveSparkPlanExec hides its inner plan
    // from TreeNode.collect until stages materialize
    val plan = Sessionize.sessions(Tables.events(spark, sf001))
      .queryExecution.executedPlan.toString
    val shuffles = "Exchange ".r.findAllIn(plan).size
    assert(shuffles == 1, s"expected 1 shuffle, got $shuffles:\n$plan")
  }

  test("group top-k matches brute force and plans a WindowGroupLimit") {
    val got = GroupTopK.topK(Tables.events(spark, sf001), k = 3)
      .orderBy("event_type", "rn")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val cents = Tables.events(spark, sf001)
      .select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast("long").as("cents"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = cents.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (et, rows) =>
      rows.sortBy(r => (-r._3, r._2)).take(3).zipWithIndex
        .map { case ((_, id, c), i) => (et, (i + 1).toLong, id, c) }
    }
    assert(got.toSeq == expected)
    // the rn <= k filter must rewrite to a per-partition partial top-k
    // (Catalyst InferWindowGroupLimit) — the property that keeps the
    // shuffle k·partitions-sized at 100 TB
    val plan = GroupTopK.topK(Tables.events(spark, sf001), k = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit in:\n$plan")
  }

  test("as-of join matches a brute-force latest-at-or-before scan") {
    val got = AsofJoin.asof(Tables.events(spark, sf001))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getLong(4))))
    val errors = events.filter(_._4 == "error")
    val expected = events.filter(_._4 == "click").sortBy(_._1).map {
      case (id, ts, user, _) =>
        val prior = errors.filter(e => e._3 == user && e._2 <= ts)
        val best =
          if (prior.isEmpty) None
          else Some(prior.maxBy(e => (e._2, e._1))) // latest ts, then max id
        (id, user, ts, best.map(_._1), best.map(_._2))
    }
    assert(got.toSeq == expected.toSeq)
  }

  test("rolling window matches a brute-force trailing-frame sweep; one shuffle") {
    val q = RollingWindow.eventsRolling(Tables.events(spark, sf001))
    val got = q.orderBy("user_id", "ts_us", "event_id")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)), r.getLong(5), r.getDouble(6)))
    val vals = Tables.events(spark, sf001)
      .select(col("event_id"), col("user_id"), unix_micros(col("ts")).as("ts_us"),
        round(col("value") * 100).cast("long").as("val_c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val expected = vals
      .groupBy(_._2).toSeq.sortBy(_._1)
      .flatMap { case (user, evs) =>
        val ordered = evs.sortBy(e => (e._3, e._1)) // (ts_us, event_id)
        ordered.zipWithIndex.map { case ((id, _, ts, vc), i) =>
          val frame = ordered.slice(math.max(0, i - RollingWindow.Preceding), i + 1)
          val sumC = frame.map(_._4).sum
          val gap = if (i == 0) None else Some(ts - ordered(i - 1)._3)
          (id, user, ts, vc, gap, sumC, sumC.toDouble / frame.size.toDouble)
        }
      }
    assert(got.toSeq == expected)
    // both window functions ride ONE hash exchange on user_id (the
    // sessionize argument) — no second shuffle for the bounded frame.
    // Count ShuffleExchange nodes specifically so a future broadcast in
    // the plan can't satisfy (or break) the pin for the wrong reason.
    // (count on toString because AdaptiveSparkPlanExec is a leaf — collect
    // can't see through the AQE boundary)
    val plan = q.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1, plan.take(2000))
    assert(!plan.contains("BroadcastExchange"), plan.take(2000))
  }
}
