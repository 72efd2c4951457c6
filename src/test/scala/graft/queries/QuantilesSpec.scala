package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{ReferenceQueries => RQ}

/** The sketch-based quantile path must track the exact path in RANK — the
  * actual accuracy contract of a percentile sketch (the value gap between
  * adjacent order statistics is data-dependent and unbounded, the rank
  * error is not).
  */
class QuantilesSpec extends SparkSpec {

  test("HLL distinct count tracks exact within the declared rsd") {
    val events = Tables.events(spark, sf001)
    val exact = RQ.eventDistinctUsers(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val approx = RQ.eventDistinctUsersApprox(events, rsd = 0.02).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet === exact.keySet)
    exact.foreach { case (k, n) =>
      // 3× the declared relative standard deviation — deterministic
      // (HLL++ is a deterministic function of the value set)
      assert(math.abs(approx(k) - n) <= math.max(1.0, 3 * 0.02 * n),
        s"group $k: approx ${approx(k)} vs exact $n")
    }
  }

  test("approx quantiles land at the right rank per group (±5 percentiles)") {
    val events = Tables.events(spark, sf001)
    val approx = RQ.eventQuantilesApprox(events).collect()
      .map(r => r.getString(0) -> Seq(0.5 -> r.getDouble(1), 0.9 -> r.getDouble(2),
        0.99 -> r.getDouble(3))).toMap
    assert(approx.nonEmpty)
    approx.foreach { case (group, ps) =>
      val values = events.filter(col("event_type") === group)
        .select("value").collect().map(_.getDouble(0)).sorted
      ps.foreach { case (target, est) =>
        val rank = values.count(_ <= est).toDouble / values.length
        assert(math.abs(rank - target) <= 0.05 || rank >= target, // tail: at/above target ok
          s"group $group p$target: est $est sits at rank $rank of ${values.length}")
        assert(rank - target <= 0.05, // but not more than 5 percentiles above
          s"group $group p$target: est $est overshoots to rank $rank")
      }
    }
  }

  test("log-histogram quantiles: bracketing guarantee vs a literal sort, " +
    "and invariance under repartitioning (the determinism the t-digest lacks)") {
    import graft.sampling.LogHistogram
    val events = Tables.events(spark, sf001)
    val got = LogHistogram.quantiles(events, col("event_type"), Tables.cents)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), Seq(
        (1, 2, r.getLong(2)), (9, 10, r.getLong(3)), (99, 100, r.getLong(4)))))
      .toMap
    assert(got.nonEmpty)
    got.foreach { case (group, (n, ests)) =>
      val cents = events.filter(col("event_type") === group)
        .select(Tables.cents).collect().map(_.getLong(0)).sorted
      assert(n === cents.length)
      ests.foreach { case (num, den, est) =>
        val trueVal = cents(((n * num + den - 1) / den - 1).toInt) // rank is 1-based
        // lower-bound estimate brackets the true order statistic within
        // one bucket: est ≤ true ≤ est·(1 + 2^-SubBits)  (exact below 2^SubBits)
        assert(est <= trueVal, s"$group $num/$den: est $est above true $trueVal")
        assert(trueVal <= est + (est >> LogHistogram.SubBits) + 1,
          s"$group $num/$den: true $trueVal outside est $est's bucket")
      }
    }
    // merge-order/partitioning invariance: per-bucket sums commute
    val re = LogHistogram.quantiles(
      events.repartition(17, col("user_id")), col("event_type"), Tables.cents)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val base = got.map { case (g, (n, es)) =>
      (g, n, es(0)._3, es(1)._3, es(2)._3) }.toSet
    assert(re === base)
  }
}
