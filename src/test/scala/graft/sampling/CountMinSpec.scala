package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class CountMinSpec extends SparkSpec {

  test("estimates never underestimate and true heavy hitters are all reported") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val hh = CountMin.heavyHitters(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(hh.nonEmpty)
    hh.foreach { case (t, exact, est) =>
      assert(est >= exact, s"CM underestimated $t: est=$est < exact=$exact")
    }
    // no false negatives: every token with exact*HeavyFrac >= N appears
    val exact = docs
      .select(explode(split(lower(col("text")), "[^a-z0-9]+")).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val trueHeavy = exact.filter { case (_, c) => c * CountMin.HeavyFrac >= n }.keySet
    val reported = hh.map(_._1).toSet
    assert(trueHeavy.subsetOf(reported),
      s"missing true heavy hitters: ${trueHeavy -- reported}")
  }

  test("every counter row sums to the stream length (mass conservation)") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val rows = CountMin.counters(docs)
      .groupBy("row").agg(sum("c").as("mass"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(rows.keySet === (0 until CountMin.Depth).toSet)
    assert(rows.values.toSet.size === 1,
      s"rows disagree on total mass: $rows")
  }

  test("one-sided error stays within the d-row min concentration bound") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val hh = CountMin.heavyHitters(docs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val n = CountMin.counters(docs)
      .filter(col("row") === 0).agg(sum("c")).collect()(0).getLong(0)
    // Markov on one row gives err <= N/w w.p. >=1/2 per row; over d=4 rows
    // the min exceeding 8·N/w has prob <= (1/8)^... — generous factor 8
    // bound that only a broken hash family would violate on this corpus
    hh.foreach { case (t, exact, est) =>
      assert(est - exact <= 8L * n / CountMin.Width,
        s"$t overcount ${est - exact} exceeds 8N/w = ${8L * n / CountMin.Width}")
    }
  }
}
