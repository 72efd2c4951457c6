package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class StratifiedSampledSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf01)

  test("per-stratum rates are honored (achieved ≈ designed per lang)") {
    val rates = Map("en" -> 0.8, "de" -> 0.2, "fr" -> 0.1)
    val s = StratifiedSampled.sample(docs, "lang", rates, defaultRatio = 0.5)
    val achieved = s.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    val totals = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    for ((lang, p) <- rates ++ Map("es" -> 0.5, "zh" -> 0.5)) {
      val a = achieved.getOrElse(lang, 0.0) / totals(lang)
      assert(math.abs(a - p) < 0.2, s"$lang achieved $a vs designed $p")
    }
  }

  test("ht_weight is exactly 1/p(stratum) and the estimate is unbiased-ish per stratum") {
    val rates = Map("en" -> 0.5, "de" -> 0.25)
    val s = StratifiedSampled.sample(docs, "lang", rates, defaultRatio = 1.0)
    val weights = s.select("lang", "ht_weight").distinct().collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(weights("en") === 2.0)
    assert(weights("de") === 4.0)
    assert(weights("fr") === 1.0)
    val est = StratifiedSampled.estimateCounts(s, "lang", "n_chars")
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val truth = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1).toDouble).toMap
    // default-ratio strata are exact; sampled strata within sampling noise
    assert(est("fr") === truth("fr"))
    assert(math.abs(est("en") - truth("en")) / truth("en") < 0.35)
  }

  test("deterministic: same seed, same surviving rows") {
    val rates = Map("en" -> 0.3)
    val a = StratifiedSampled.sample(docs, "lang", rates).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val b = StratifiedSampled.sample(docs, "lang", rates).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a === b)
  }
}
