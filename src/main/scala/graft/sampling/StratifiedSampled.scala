package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stratified Bernoulli sampling: a different rate per stratum (source,
  * language, quality band…), with per-row Horvitz–Thompson weights.
  *
  * The uniform sampler treats a 100 TB corpus as one population; real
  * training-data curation over-samples rare strata (low-resource languages,
  * high-quality sources) and under-samples the bulk. Implementation is the
  * same seeded scan-fused filter — the keep probability is just looked up
  * per row from the stratum map (a broadcast-sized CASE expression), and
  * every surviving row carries `ht_weight = 1/p(stratum)` so any additive
  * aggregate downstream is unbiased via `sum(x · ht_weight)`.
  */
object StratifiedSampled {

  /** Sample with per-stratum rates; unlisted strata use `defaultRatio`.
    * Output = surviving rows + an `ht_weight` column.
    */
  def sample(
      df: DataFrame,
      stratumCol: String,
      rates: Map[String, Double],
      defaultRatio: Double = 1.0,
      seed: Long = SamplingConfig.DefaultSeed): DataFrame = {
    val p: Column = rates.foldLeft(lit(defaultRatio)) { case (acc, (stratum, rate)) =>
      when(col(stratumCol) === stratum, lit(rate)).otherwise(acc)
    }
    df.withColumn("__p", p)
      .filter(rand(seed) < col("__p"))
      .withColumn("ht_weight", lit(1.0) / col("__p"))
      .drop("__p")
  }

  /** Unbiased stratified estimate of `SELECT stratum, count(*), sum(v)`:
    * weighted sums over the sample.
    */
  def estimateCounts(sampled: DataFrame, stratumCol: String, valueCol: String): DataFrame =
    sampled
      .groupBy(col(stratumCol))
      .agg(
        sum(col("ht_weight")).as("est_cnt"),
        sum(col(valueCol) * col("ht_weight")).as("est_sum"))
}
