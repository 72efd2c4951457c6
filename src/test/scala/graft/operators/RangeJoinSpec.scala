package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** [[RangeJoin]]: bucket expansion must reproduce the exact containment
  * join (including overlapping intervals), and must plan as a HASH join —
  * the whole point is escaping BroadcastNestedLoopJoin.
  */
class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("eventsByTier equals a brute-force containment scan") {
    val cents = Tables.events(spark, sf001)
      .select(round(col("value") * 100).cast("long").as("cents"))
      .collect().map(_.getLong(0))
    val expected = RangeJoin.Tiers.map { case (t, lo, hi) =>
      val in = cents.filter(c => c >= lo && c < hi)
      (t, in.length.toLong, in.sum)
    }.filter(_._2 > 0).sortBy(_._1)
    val got = RangeJoin.eventsByTier(spark, Tables.events(spark, sf001))
      .orderBy("tier").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
  }

  test("overlapping intervals each match; bucket-edge values land correctly") {
    val facts = Seq(0L, 999L, 1000L, 1001L, 2499L, 2500L, 9999L).toDF("v")
    val intervals = Seq(
      ("a", 0L, 1000L), ("b", 500L, 2500L), ("c", 1000L, 1001L), ("d", 2500L, 10000L))
      .toDF("tier", "lo", "hi")
    val got = RangeJoin.joinByRange(facts, "v", intervals, width = 1000L)
      .select("v", "tier").collect().map(r => (r.getLong(0), r.getString(1))).sorted
    val expected = (for {
      v <- Seq(0L, 999L, 1000L, 1001L, 2499L, 2500L, 9999L)
      (t, lo, hi) <- Seq(("a", 0L, 1000L), ("b", 500L, 2500L), ("c", 1000L, 1001L), ("d", 2500L, 10000L))
      if v >= lo && v < hi
    } yield (v, t)).sorted
    assert(got.toSeq == expected)
  }

  test("the range join plans as a hash join, not a nested loop") {
    val plan = RangeJoin.eventsByTier(spark, Tables.events(spark, sf001))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"), s"nested loop in:\n$plan")
    assert(plan.contains("BroadcastHashJoin"), s"no hash join in:\n$plan")
  }
}
