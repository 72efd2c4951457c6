package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Congressional sampling: the allocation guarantees that make derived
  * per-stratum rates an ESTIMATOR with uniform per-group error — exact
  * ceil-division thresholds, complete (exact) small strata, ~targetK
  * survivors in sampled strata regardless of skew, never-zero rates, HT
  * tracking of the exact twin, determinism, and the broadcast-join plan
  * shape (the fact table crosses no exchange before it is thinned).
  */
class CongressionalSampledSpec extends SparkSpec {

  private def skewed = {
    // two strata with 100x size skew: 'rare' 50 rows, 'bulk' 5000 rows
    import spark.implicits._
    spark.range(5050).select(
      when(col("id") < 50, "rare").otherwise("bulk").as("g"),
      col("id").as("unit"),
      (col("id") % 7 + 1).as("v"))
  }

  test("rates: exact ceil-division thresholds, complete small strata, never zero") {
    val r = CongressionalSampled
      .rates(skewed, col("g"), targetK = 300)
      .collect()
      .map(row => row.getString(0) -> (row.getLong(1), row.getLong(2)))
      .toMap
    assert(r("rare") === ((50L, CongressionalSampled.Mod))) // n <= k -> keep all
    // ceil(300 * 10000 / 5000) = 600
    assert(r("bulk") === ((5000L, 600L)))
    // a stratum (vastly) larger than k*Mod still gets bp >= 1, never 0
    val big = spark.range(200000).select(lit("x").as("g"), col("id").as("unit"))
    val bp = CongressionalSampled.rates(big, col("g"), targetK = 1)
      .head().getLong(2)
    assert(bp === 1L)
  }

  test("small strata ride complete: est == exact, n_kept == n_exact") {
    val est = CongressionalSampled
      .estimate(skewed, col("g"), col("unit"), col("v"), targetK = 300)
      .filter(col("stratum") === "rare")
      .head()
    val exact = skewed.filter(col("g") === "rare")
      .agg(count(lit(1)), sum(col("v"))).head()
    assert(est.getLong(3) === est.getLong(1)) // n_kept == n_exact
    assert(est.getDouble(4) === exact.getLong(0).toDouble) // est_cnt exact
    assert(est.getDouble(5) === exact.getLong(1).toDouble) // est_sum exact
  }

  test("sampled strata keep ~targetK rows and HT-track the exact twin") {
    val est = CongressionalSampled
      .estimate(skewed, col("g"), col("unit"), col("v"), targetK = 300)
      .filter(col("stratum") === "bulk")
      .head()
    val exact = skewed.filter(col("g") === "bulk")
      .agg(count(lit(1)), sum(col("v"))).head()
    val kept = est.getLong(3)
    // deterministic sample, expected 5000 * 600/10000 = 300
    assert(kept > 150 && kept < 600, s"kept $kept, expected ~300")
    val relCnt = math.abs(est.getDouble(4) - exact.getLong(0)) / exact.getLong(0)
    val relSum = math.abs(est.getDouble(5) - exact.getLong(1)) / exact.getLong(1)
    // ~1/sqrt(300) = 5.8% expected relative error; fixed numbers, not flaky
    assert(relCnt < 0.2, s"relative count error $relCnt")
    assert(relSum < 0.2, s"relative sum error $relSum")
  }

  test("uniform per-group support under 100x skew (the congressional point)") {
    val kept = CongressionalSampled
      .sample(skewed, col("g"), col("unit"), targetK = 30)
      .groupBy(col("g")).agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // both strata land near 30 survivors despite the 100x size gap
    assert(kept("rare") > 15 && kept("rare") <= 50, s"rare ${kept("rare")}")
    assert(kept("bulk") > 15 && kept("bulk") < 60, s"bulk ${kept("bulk")}")
  }

  test("bpFor invariants hold on arbitrary (n, targetK) — property-tested") {
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    val gen = for {
      n <- Gen.chooseNum(1L, 1000000000000L)
      k <- Gen.chooseNum(1, 1000000)
    } yield (n, k)
    val prop = Prop.forAll(gen) { case (n, k) =>
      val bp = CongressionalSampled.bpFor(n, k)
      val mod = CongressionalSampled.Mod
      val inRange = bp >= 1L && bp <= mod
      val keepAllIff = (bp == mod) == (n <= k)
      // expected survivors n*bp/Mod in [k, k + n/Mod) for sampled strata
      val support = n <= k || {
        val kept = BigInt(n) * bp
        kept >= BigInt(k) * mod && kept < BigInt(k) * mod + n
      }
      val monotone = CongressionalSampled.bpFor(n + 1, k) <= bp
      inRange && keepAllIff && support && monotone
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(500), prop)
    assert(res.passed, res.status.toString)
  }

  test("rates' Column derivation equals the pure bpFor on a generated grid") {
    // the in-plan expr and the Scala twin must never drift: drive rates()
    // with strata of known sizes spanning the regime boundaries
    val sizes = Seq(1L, 2L, 299L, 300L, 301L, 999L, 1000L, 5000L, 54321L, 300L * 10000L + 1)
    val df = sizes.zipWithIndex.map { case (n, i) =>
      spark.range(n).select(lit(s"s$i").as("g"), col("id").as("unit"))
    }.reduce(_ unionAll _)
    val got = CongressionalSampled.rates(df, col("g"), targetK = 300)
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    sizes.zipWithIndex.foreach { case (n, i) =>
      assert(got(s"s$i") === ((n, CongressionalSampled.bpFor(n, 300))),
        s"drift at n=$n")
    }
  }

  test("null units are excluded from n_exact, not just from the sample") {
    // if null-unit rows were counted but never sampleable, every estimate
    // would bias low (a kept fraction drawn from a smaller real population
    // scaled as if from the bigger one) — and the oracle would mirror the
    // bias where no gate could see it
    val withNulls = spark.range(200).select(
      lit("g").as("g"),
      when(col("id") < 100, col("id")).otherwise(lit(null)).as("unit"),
      lit(1L).as("v"))
    val r = CongressionalSampled
      .estimate(withNulls, col("g"), col("unit"), col("v"), targetK = 300)
      .head()
    assert(r.getLong(1) === 100L, "n_exact must count only sampleable rows")
    assert(r.getLong(3) === 100L) // n <= k -> complete over the non-null population
    assert(r.getDouble(4) === 100.0)
  }

  test("unit atomicity: sampling on a parent key keeps whole parents") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val kept = CongressionalSampled.sample(
      events, col("event_type"), col("user_id"), targetK = 100)
      .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("n"))
    val full = events
      .groupBy(col("event_type"), col("user_id")).agg(count(lit(1)).as("n_full"))
    // every (stratum, kept user) carries ALL that user's rows in the
    // stratum — none thinned
    val thinned = kept.join(full, Seq("event_type", "user_id"))
      .filter(col("n") =!= col("n_full"))
    assert(thinned.count() === 0)
    assert(kept.count() > 0)
  }

  test("deterministic: two runs produce identical frames") {
    val a = CongressionalSampled
      .estimate(skewed, col("g"), col("unit"), col("v"), targetK = 300).collect()
    val b = CongressionalSampled
      .estimate(skewed, col("g"), col("unit"), col("v"), targetK = 300).collect()
    assert(a.toSeq === b.toSeq)
  }

  test("live events: declared-query strata are exact where n <= k") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val stratum = concat(col("event_type"), lit(":"),
      length(col("user_id").cast("string")).cast("string"))
    val est = CongressionalSampled.estimate(
      events, stratum, col("event_id"),
      round(col("value") * 100).cast("long"), targetK = 300)
      .collect()
    assert(est.nonEmpty)
    val exact = events
      .groupBy(stratum.as("stratum"))
      .agg(sum(round(col("value") * 100).cast("long")).as("s"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    est.filter(r => r.getLong(1) <= 300).foreach { r =>
      assert(r.getDouble(5) === exact(r.getString(0)).toDouble,
        s"complete stratum ${r.getString(0)} must be exact")
      assert(r.getLong(3) === r.getLong(1))
    }
  }

  test("bounds: complete strata report 0; sampled strata uniform ~z*sqrt(0.25/k)") {
    val est = CongressionalSampled
      .estimateWithBounds(skewed, col("g"), col("unit"), col("v"), targetK = 300)
      .collect().map(r => r.getString(0) -> r).toMap
    // complete stratum: exact estimate, zero error bound
    assert(est("rare").getDouble(6) === 0.0)
    // sampled stratum: the reference formula with N=n_exact, n=n_kept
    val r = est("bulk")
    val n = r.getLong(1); val kept = r.getLong(3)
    val expected = Stats.zScore(0.95) * math.sqrt(0.25 / kept) *
      math.sqrt((n - kept).toDouble / (n - 1))
    assert(r.getDouble(6) === expected)
    // ~z*sqrt(0.25/300) = 5.7% at the target support
    assert(r.getDouble(6) > 0.02 && r.getDouble(6) < 0.12, s"bound ${r.getDouble(6)}")
  }

  test("bounds: uniform across sampled strata of very different sizes") {
    assumeTestdata(sf001)
    // force sampling everywhere with a small k on the live skewed strata
    val events = Tables.events(spark, sf001)
    val stratum = concat(col("event_type"), lit(":"),
      length(col("user_id").cast("string")).cast("string"))
    val bounds = CongressionalSampled.estimateWithBounds(
      events, stratum, col("event_id"),
      round(col("value") * 100).cast("long"), targetK = 30)
      .collect().map(_.getDouble(6)).filter(_ > 0)
    assert(bounds.nonEmpty)
    // every sampled stratum's bound sits in one narrow band regardless of
    // its population — the allocation guarantee
    assert(bounds.max / bounds.min < 2.0,
      s"bounds not uniform: min ${bounds.min} max ${bounds.max}")
  }

  test("plan: rate table broadcasts; fact side reaches the join unshuffled") {
    val df = CongressionalSampled
      .estimate(skewed, col("g"), col("unit"), col("v"), targetK = 300)
    df.collect()
    val nodes = allPlanNodes(df.queryExecution.executedPlan)
    val bhj = nodes.collectFirst {
      case b: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => b
    }
    assert(bhj.isDefined,
      s"expected the rate table to broadcast:\n${df.queryExecution.executedPlan}")
    // the streamed (fact) side must reach the join straight from the scan —
    // the unsampled rows never cross a shuffle; toString pretty-prints
    // through nested stage boundaries, so any exchange below is visible.
    // streamedPlan is protected, so pick the non-broadcast child by shape.
    val streamed = bhj.get.children
      .filterNot(_.toString.contains("BroadcastExchange"))
      .filterNot(_.toString.contains("BroadcastQueryStage"))
    assert(streamed.size === 1, s"expected one streamed side:\n${bhj.get}")
    assert(!streamed.head.toString.contains("ShuffleExchange"),
      s"fact side must not shuffle before the keep-filter:\n${streamed.head}")
  }
}
