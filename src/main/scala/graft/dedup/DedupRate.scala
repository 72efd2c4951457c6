package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-rate estimation — the "how duplicated is this 100 TB corpus?"
  * sizing question a curation pipeline asks before paying for full dedup.
  *
  * The statistical point: a Bernoulli ROW sample is the WRONG tool here. A
  * duplicate pair survives row sampling with probability p², so the
  * duplicate rate measured in a 10 % row sample understates the corpus rate
  * ~10×. The right tool is UNIVERSE (hash-range) sampling: keep a document
  * iff a deterministic hash of its CONTENT falls in a fixed range. All
  * copies of the same text share the hash, so every duplicate cluster is
  * kept or dropped ATOMICALLY — the sample is an unbiased cluster-level
  * sample and its within-sample duplicate rate estimates the corpus rate
  * directly (the universe-sampling idea from approximate join processing,
  * e.g. Kandula et al., "Quickr", SIGMOD 2016 §4).
  *
  * Because the sampling predicate is a deterministic function of the data
  * (md5-prefix hash, no RNG), the whole estimator is replayable in DuckDB —
  * this is the one SAMPLED query family that can be fully oracle-gated.
  *
  * Scale shape: the hash-range filter is a codegen'd scan-stage predicate
  * (1−p of the corpus never leaves the scan loop), then one hash aggregate
  * over the surviving p fraction — strictly cheaper than the exact twin.
  */
object DedupRate {

  /** Modulus for the hash-range predicate (percent granularity). */
  val RangeMod = 100L

  /** Exact corpus duplicate statistics: one row —
    * (n_docs, n_distinct, n_dup_docs, dup_rate).
    */
  def rateStats(corpus: DataFrame): DataFrame =
    corpus
      .select(Hashing.hash60(col("text")).as("__h"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("__c"))
      .agg(
        sum(col("__c")).cast("long").as("n_docs"),
        count(lit(1)).cast("long").as("n_distinct"))
      .withColumn("n_dup_docs", (col("n_docs") - col("n_distinct")).cast("long"))
      .withColumn("dup_rate", col("n_dup_docs").cast("double") / col("n_docs"))

  /** Universe sample: keep docs whose content hash lands in the first
    * `pct` of [[RangeMod]] residues. hash60 is non-negative (60-bit), so
    * `%` is safe in both engines.
    */
  def universeSample(corpus: DataFrame, pct: Int): DataFrame =
    corpus.filter(Hashing.hash60(col("text")) % RangeMod < pct)

  /** [[rateStats]] over a `pct`-percent universe sample, with HT-scaled
    * corpus estimates for the additive counts. `dup_rate` needs NO scaling:
    * it is a ratio of two quantities scaled by the same 1/p (self-
    * normalizing), which is exactly why cluster-atomic sampling estimates
    * it unbiasedly.
    */
  def rateStatsSampled(corpus: DataFrame, pct: Int = 10): DataFrame = {
    val scale = RangeMod.toDouble / pct
    rateStats(universeSample(corpus, pct))
      .withColumn("est_n_docs", col("n_docs") * scale)
      .withColumn("est_n_distinct", col("n_distinct") * scale)
      .withColumn("est_n_dup_docs", col("n_dup_docs") * scale)
  }

  // ---- DuckDB oracle generation ----

  private def statsSql(from: String): String =
    s"""SELECT CAST(sum(c) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_distinct,
       |       CAST(sum(c) - count(*) AS BIGINT) AS n_dup_docs,
       |       CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_rate
       |FROM (SELECT h, count(*) AS c FROM $from GROUP BY h)""".stripMargin

  def rateStatsOracleSql: String =
    s"""WITH corpus AS (${DedupCorpus.augmentSql}),
       |h AS (SELECT ${Hashing.hash60Sql("text")} AS h FROM corpus)
       |${statsSql("h")}""".stripMargin

  def rateStatsSampledOracleSql(pct: Int = 10): String =
    s"""WITH corpus AS (${DedupCorpus.augmentSql}),
       |h AS (SELECT ${Hashing.hash60Sql("text")} AS h FROM corpus),
       |s AS (SELECT h FROM h WHERE h % $RangeMod < $pct),
       |stats AS (${statsSql("s")})
       |SELECT n_docs, n_distinct, n_dup_docs, dup_rate,
       |       n_docs * ${RangeMod.toDouble} / $pct AS est_n_docs,
       |       n_distinct * ${RangeMod.toDouble} / $pct AS est_n_distinct,
       |       n_dup_docs * ${RangeMod.toDouble} / $pct AS est_n_dup_docs
       |FROM stats""".stripMargin
}
