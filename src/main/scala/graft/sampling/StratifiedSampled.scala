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

  /** Per-ten-thousand modulus for the universe-stratified keep-predicate
    * (basis-point granularity, so a 0.05 % stratum rate is expressible).
    */
  val FineMod = 10000L

  private val Salt = "su:"

  /** Universe (hash-range) stratified sample: same per-stratum rates as
    * [[sample]], but the keep decision is a deterministic hash of `unit`
    * against a per-stratum threshold in basis points (`ratesBp`, out of
    * [[FineMod]]) — fully replayable in the DuckDB oracle, unlike
    * `rand(seed)` (see [[UniverseSampled]]). Thresholds are INTEGERS so
    * both the predicate and `ht_weight` = FineMod/threshold are engine-
    * exact (10000/500 = 20.0 etc. — exact in IEEE 754).
    */
  def sampleUniverse(
      df: DataFrame,
      stratumCol: String,
      unit: Column,
      ratesBp: Map[String, Int],
      defaultBp: Int = FineMod.toInt): DataFrame = {
    val thr: Column = ratesBp.foldLeft(lit(defaultBp)) { case (acc, (stratum, bp)) =>
      when(col(stratumCol) === stratum, lit(bp)).otherwise(acc)
    }
    df.withColumn("__thr", thr)
      .filter(
        graft.dedup.Hashing.hash60(concat(lit(Salt), unit.cast("string")))
          % FineMod < col("__thr"))
      .withColumn("ht_weight", lit(FineMod.toDouble) / col("__thr"))
      .drop("__thr")
  }

  /** DuckDB oracle fragments for [[sampleUniverse]] +
    * [[estimateCounts]]: (threshold CASE expression, keep predicate) over
    * `unitExpr`.
    */
  def universeSqlParts(
      stratumCol: String,
      unitExpr: String,
      ratesBp: Map[String, Int],
      defaultBp: Int = FineMod.toInt): (String, String) = {
    val thrSql = ratesBp
      .map { case (stratum, bp) => s"WHEN $stratumCol = '$stratum' THEN $bp" }
      .mkString("CASE ", " ", s" ELSE $defaultBp END")
    val keepSql =
      s"${graft.dedup.Hashing.hash60Sql(s"'$Salt' || CAST($unitExpr AS VARCHAR)")}" +
        s" % $FineMod < $thrSql"
    (thrSql, keepSql)
  }
}
