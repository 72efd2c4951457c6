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

  test("set algebra, exact regime: unsaturated sketches give exact union/intersection/Jaccard") {
    val rows = (1 to 10).map(i => ("a", s"e$i")) ++ (6 to 20).map(i => ("b", s"e$i"))
    val out = KmvSketch.pairwiseOverlap(rows.toDF("g", "e"), col("g"), col("e"), k = 64)
      .collect()
    assert(out.length === 1)
    val r = out.head
    assert((r.getString(0), r.getString(1)) === ("a", "b"))
    assert(r.getLong(2) === 20L, "exact union") // |{e1..e20}|
    assert(r.getLong(3) === 5L, "exact intersection") // {e6..e10}
    assert(r.getLong(4) === 250L, "exact Jaccard permille") // 1000*5//20
  }

  test("set algebra, saturated regime: combined sketch estimate == direct sketch of the union") {
    // both sides exceed k, overlap region 1000..2000 — the Beyer'07 claim
    // under test is that bottom-k(L_A ∪ L_B) is bit-identical to the
    // sketch built from the union corpus itself, so est_union must EQUAL
    // the single-group estimate, not just approximate it
    val k = 32
    val a = (1L to 2000L).map(i => ("a", i))
    val b = (1000L to 3000L).map(i => ("b", i))
    val est = KmvSketch.pairwiseOverlap((a ++ b).toDF("g", "e"), col("g"), col("e"), k)
      .collect().head.getLong(2)
    val direct = KmvSketch.distinctEstimateAgg(
      (a ++ b).map { case (_, e) => ("all", e) }.toDF("g", "e"), col("g"), col("e"), k)
      .collect().head.getLong(1)
    assert(est === direct,
      s"combined-sketch union estimate $est must equal the direct union sketch $direct")
  }

  test("incremental vocab: saved-base + delta merge equals the full recompute, reading the artifact") {
    assumeTestdata(sf001)
    val inc = KmvSketch.vocabIncremental(spark, sf001)
    val got = inc.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the saved sketch must come from the published artifact, not a
    // recomputation of the base corpus (paths are elided from the
    // optimized-plan string — read the executed scan locations)
    val scanPaths = allPlanNodes(inc.queryExecution.executedPlan).collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec =>
        f.relation.location.rootPaths.mkString(",")
    }
    assert(scanPaths.exists(_.contains("graft_kmvvocab")),
      s"incremental plan must read the saved sketch artifact; scans: $scanPaths")
    val full = KmvSketch.distinctEstimateAgg(
      Tables.documents(spark, sf001)
        .select(col("source"), explode(graft.dedup.Hashing.words(col("text"))).as("w"))
        .filter(col("w") =!= ""),
      col("source"), col("w"), KmvSketch.VocabK)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === full,
      "merge of saved base sketch + delta sketch must equal the full recompute bit-for-bit")
  }

  test("set algebra on the live corpus: bounds hold and estimates track exact overlap") {
    assumeTestdata(sf001)
    val toks = Tables.documents(spark, sf001)
      .select(col("source"), explode(graft.dedup.Hashing.words(col("text"))).as("w"))
      .filter(col("w") =!= "")
    val k = KmvSketch.VocabK
    val est = KmvSketch.pairwiseOverlap(toks, col("source"), col("w"), k)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // exact pairwise truth via a (source, token) self-join — affordable at
    // fixture scale, the cost the sketch exists to avoid at corpus scale
    val v = toks.distinct().cache()
    val exact = v.as("x").join(v.as("y"),
        col("x.w") === col("y.w") && col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("sa"), col("y.source").as("sb"))
      .agg(countDistinct(col("x.w")).as("inter"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val sizes = v.groupBy("source").agg(countDistinct("w").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bound = 4.0 / math.sqrt(k.toDouble)
    est.foreach { case ((a, b), (eu, ei, jp)) =>
      val inter = exact.getOrElse((a, b), 0L).toDouble
      val union = sizes(a) + sizes(b) - inter
      assert(ei <= eu && jp >= 0 && jp <= 1000, s"($a,$b) ordering/range sanity")
      assert(math.abs(eu - union) / union < bound,
        s"($a,$b): est_union $eu vs exact $union (bound $bound)")
      val j = inter / union
      assert(math.abs(jp - 1000 * j) < 150,
        s"($a,$b): jaccard_permille $jp vs exact ${1000 * j}")
    }
    v.unpersist()
  }
}
