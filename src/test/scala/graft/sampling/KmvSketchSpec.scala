package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class KmvSketchSpec extends SparkSpec {
  import spark.implicits._

  test("exact branch: fewer than k distinct elements reports the exact count") {
    val df = Seq(("a", 1L), ("a", 2L), ("a", 2L), ("b", 7L)).toDF("g", "e")
    val out = KmvSketch.distinctEstimate(df, col("g"), col("e"), k = 16)
      .as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 2L, "b" -> 1L))
  }

  test("estimator branch: within 4/sqrt(k) of truth on the live events") {
    val events = Tables.events(spark, sf01)
    val exact = events.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    val k = KmvSketch.GroupK
    assert(exact.values.forall(_ > k), "fixture too small to exercise the estimator")
    val est = KmvSketch.distinctEstimate(events, col("event_type"), col("user_id"), k)
      .as[(String, Long)].collect().toMap
    val bound = 4.0 / math.sqrt(k.toDouble)
    est.foreach { case (g, e) =>
      val x = exact(g).toDouble
      assert(math.abs(e - x) / x < bound, s"group $g: est $e vs exact ${exact(g)} (bound $bound)")
    }
  }

  test("determinism: estimate is identical across repartitionings") {
    val events = Tables.events(spark, sf01)
    val a = KmvSketch.distinctEstimate(events, col("event_type"), col("user_id"), 32).collect()
    val b = KmvSketch.distinctEstimate(
      events.repartition(13), col("event_type"), col("user_id"), 32).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("native bottom_k aggregate: identical rows to the window spelling") {
    val events = Tables.events(spark, sf01)
    val win = KmvSketch.distinctEstimate(events, col("event_type"), col("user_id"), 32)
      .collect().toSeq
    val agg = KmvSketch.distinctEstimateAgg(events, col("event_type"), col("user_id"), 32)
      .collect().toSeq
    assert(agg === win)
  }

  test("native bottom_k aggregate: partial (map-side) aggregation in the plan") {
    val plan = KmvSketch.distinctEstimateAgg(
      Tables.events(spark, sf001), col("event_type"), col("user_id"), 32)
      .queryExecution.executedPlan.toString
    // TypedImperativeAggregate runs under ObjectHashAggregate with a
    // partial_bottom_k before the exchange — the mergeable-sketch shape
    assert(plan.contains("partial_bottom_k"), s"no partial aggregation:\n$plan")
    assert(!plan.contains("WindowGroupLimit"), s"window leaked into the agg path:\n$plan")
  }

  test("bottom_k semantics: distinct, sorted, trimmed to k") {
    import spark.implicits._
    val df = Seq(("g", 5L), ("g", 3L), ("g", 5L), ("g", 9L), ("g", 1L), ("g", 7L))
      .toDF("g", "v")
    val arr = df.groupBy("g")
      .agg(graft.functions.BottomKDistinct.bottomK(col("v"), 3).as("arr"))
      .select("arr").head.getSeq[Long](0)
    assert(arr === Seq(1L, 3L, 5L))
  }

  test("plan: bottom-k runs a pre-shuffle WindowGroupLimit") {
    val plan = KmvSketch.distinctEstimate(
      Tables.events(spark, sf001), col("event_type"), col("user_id"), 32)
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }

  test("bottom_k: a foldable NULL k fails the type check, not an analysis NPE") {
    // ADVICE r13: checkInputDataTypes evaluated the lazy k before the null
    // check, so SQL's bottom_k(x, CAST(NULL AS INT)) threw NPE mid-analysis
    import spark.implicits._
    Seq(("g", 1L)).toDF("g", "v").createOrReplaceTempView("bk_null_k")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT g, bottom_k(v, CAST(NULL AS INT)) FROM bk_null_k GROUP BY g").collect()
    }
    assert(e.getMessage.toLowerCase.contains("null"))
  }
}
