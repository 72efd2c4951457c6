package graft.sampling

import graft.SparkSpec
import graft.queries.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{CollectLimitExec, GlobalLimitExec}

class WeightedSampledSpec extends SparkSpec {

  /** Local replay of the cross-engine hash (md5 hex prefix, base 16). */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }

  private def aesKey(id: Long, w: Int): Long =
    (1 to w).map(j => hash60(s"aes:$id#$j")).max

  private def docsDf(rows: Seq[(Long, String, Long)]): DataFrame = {
    import spark.implicits._
    rows.toDF("doc_id", "source", "n_chars")
      .withColumn("text", lit("x")).withColumn("lang", lit("en"))
  }

  test("weight clamps: NULL and tiny to 1, huge to MaxWeight, monotone in n_chars") {
    import spark.implicits._
    val got = Seq[java.lang.Long](null, 0L, 99L, 100L, 250L, 750L, 1000000L, -5L)
      .toDF("n_chars")
      .select(WeightedSampled.weight(col("n_chars")).as("w"))
      .collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 1L, 1L, 2L, 3L, 8L, 8L, 1L))
  }

  test("selected set is exactly the local A-ES replay (top-k by max-of-w draws)") {
    val rows = (1L to 40L).map(i => (i, s"s${i % 3}", i * 37 % 900))
    val expected = rows
      .map { case (id, _, nc) =>
        val w = math.min(8L, math.max(1L, 1L + nc / WeightedSampled.WeightDiv)).toInt
        (id, w.toLong, aesKey(id, w))
      }
      .sortBy { case (id, _, k) => (-k, id) }
      .take(4) // k = max(1, 40/10)
      .sortBy(_._1)
    val got = WeightedSampled.sample(docsDf(rows)).orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === expected)
  }

  test("k floors at 1 on a tiny corpus and the sample is deterministic") {
    val tiny = docsDf(Seq((1L, "a", 10L), (2L, "a", 20L), (3L, "b", 30L)))
    val s1 = WeightedSampled.sample(tiny).collect()
    val s2 = WeightedSampled.sample(tiny).collect()
    assert(s1.length === 1)
    assert(s1.map(_.toString).toSeq === s2.map(_.toString).toSeq)
  }

  test("weight-8 docs are selected far more often than weight-1 docs") {
    // 200 docs, half w=1 (n_chars=50), half w=8 (n_chars=5000); k=20.
    // E[selected | w=8] ≈ 8x E[selected | w=1]; with 20 draws the heavy
    // half should take a clear majority (probabilistic but the margin is
    // enormous — the fixture is deterministic, so no flakiness).
    val rows = (1L to 200L).map(i => (i, "s", if (i % 2 == 0) 5000L else 50L))
    val sel = WeightedSampled.sample(docsDf(rows)).collect()
    assert(sel.length === 20)
    val heavy = sel.count(_.getLong(1) == 8L)
    assert(heavy >= 14, s"heavy-weight selections $heavy/20 — expected a clear majority")
  }

  test("summary accounts every source and its n_sel sums to k") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val n = docs.count()
    val k = math.max(1L, n / WeightedSampled.SampleDiv)
    val sum = WeightedSampled.summary(docs).collect()
    assert(sum.map(_.getAs[Long]("n_sel")).sum === k)
    assert(sum.map(_.getAs[Long]("n_src")).sum === n)
    sum.foreach { r =>
      val permille = r.getAs[Long]("sel_permille")
      assert(permille === 1000L * r.getAs[Long]("n_sel") / r.getAs[Long]("n_src"))
    }
  }

  test("per-source quotas: each source keeps exactly max(1, n_s/10) docs, matching the local replay") {
    // uneven sources: 40/25/3 docs — quotas 4/2/1 (the floor branch fires)
    val rows = (1L to 40L).map(i => (i, "big", i * 37 % 900)) ++
      (101L to 125L).map(i => (i, "mid", i * 53 % 900)) ++
      (201L to 203L).map(i => (i, "tiny", 50L))
    val got = WeightedSampled.sampleBySource(docsDf(rows)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val bySrc = got.groupBy(_._1).view.mapValues(_.length).toMap
    assert(bySrc === Map("big" -> 4, "mid" -> 2, "tiny" -> 1))
    // exact replay: per source, top-k_s by (key desc, id)
    val expected = rows.groupBy(_._2).flatMap { case (src, rs) =>
      val ks = math.max(1L, rs.size / WeightedSampled.SampleDiv)
      rs.map { case (id, _, nc) =>
        val w = math.min(8L, math.max(1L, 1L + nc / WeightedSampled.WeightDiv)).toInt
        (src, id, w.toLong, aesKey(id, w))
      }.sortBy { case (_, id, _, k) => (-k, id) }.take(ks.toInt)
    }.toSet
    assert(got.toSet === expected)
  }

  test("plan shape: no limit funnel — selection is a rank filter, not GlobalLimit") {
    assumeTestdata(sf001)
    val df = WeightedSampled.sample(Tables.documents(spark, sf001))
    df.collect() // finalize AQE stages
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    assert(!nodes.exists(n =>
      n.isInstanceOf[GlobalLimitExec] || n.isInstanceOf[CollectLimitExec]),
      "weighted sample must not funnel k rows through a single-task limit")
  }
}
