package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sampling.SamplingConfig

class TpchSpec extends SparkSpec {

  test("q1: six groups, cutoff filters rows, integer sums positive") {
    val out = TpchQueries.q1(Tables.lineitem(spark, sf01)).collect()
    assert(out.length === 6) // 3 returnflags × 2 linestatuses
    assert(out.forall(_.getLong(2) > 0))
    val kept = Tables.lineitem(spark, sf01)
      .filter(col("l_shipdate") <= lit(TpchQueries.Q1Cutoff).cast("timestamp")).count()
    assert(out.map(_.getLong(6)).sum === kept)
    assert(kept < Tables.lineitem(spark, sf01).count())
  }

  test("sampled q1: HT estimates track exact within sampling noise per group") {
    val exact = TpchQueries.q1(Tables.lineitem(spark, sf01))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(6).toDouble).toMap
    val est = TpchQueries.q1Sampled(Tables.lineitem(spark, sf01), SamplingConfig(ratio = 0.1))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(6))
    est.foreach { case (k, e) =>
      val x = exact(k)
      // per-group counts ~5k at ratio 0.1: rel-stddev ≈ sqrt((1-p)/(p·x)) ≈ 0.043 → 4σ
      assert(math.abs(e - x) / x < 0.18, s"group $k: est $e vs exact $x")
    }
  }
}
