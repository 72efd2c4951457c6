package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class WinsorizeSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf001)

  test("clip band: outputs inside [p01, p99]; interior values untouched") {
    val thr = events.groupBy("event_type")
      .agg(percentile(col("value"), lit(0.01)).as("lo"),
        percentile(col("value"), lit(0.99)).as("hi"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    val out = Winsorize.clipped(events).collect()
    assert(out.length === events.count())
    out.foreach { r =>
      val (lo, hi) = thr(r.getString(1))
      val v = r.getDouble(2); val w = r.getDouble(3)
      assert(w >= lo && w <= hi, s"clipped value $w outside [$lo, $hi]")
      if (v >= lo && v <= hi) assert(w === v, "interior value was altered")
      else assert(w === lo || w === hi, "exterior value not clipped to a bound")
    }
    // the band must actually bite at 1 % tails on a 10k-event fixture
    assert(out.exists(r => r.getDouble(2) != r.getDouble(3)), "nothing clipped")
  }

  test("plan: threshold table is broadcast — the fact never reshuffles") {
    val plan = Winsorize.clipped(events).queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no broadcast join:\n$plan")
  }
}
