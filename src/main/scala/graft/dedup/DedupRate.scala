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

  /** Largest cluster size the sampled-histogram estimator's weight table
    * covers. Observed sampled sizes can only be ≤ true sizes, and the
    * exact twin shows the corpus tops out at size 2 (size 8 leaves 4×
    * headroom); a corpus whose clusters outgrow this would need the table
    * widened, which ClusterHistSpec checks loudly against the live data.
    */
  val MaxHistSize = 8

  /** EXACT cluster-size histogram: how many exact-dup clusters (same
    * content hash) have exactly k members — the sizing curve a dedup
    * planner reads before choosing a strategy (mass in k=2 pairs vs deep
    * mirror families). One hash agg to sizes, one to the histogram.
    */
  def clusterSizeHist(corpus: DataFrame): DataFrame =
    corpus
      .select(Hashing.hash60(col("text")).as("__h"))
      .groupBy(col("__h"))
      .agg(count(lit(1)).as("cluster_size"))
      .groupBy(col("cluster_size"))
      .agg(count(lit(1)).cast("long").as("n_clusters"))

  /** SECOND-ORDER-HT sampled twin of [[clusterSizeHist]], sampled DOC-
    * atomically (unit = doc_id, deliberately NOT the content hash): each
    * member of a size-k cluster survives independently with p = pct/100,
    * so the full cluster survives with pᵏ and partial survivals fold a
    * true size-k cluster into every observed size j ≤ k with binomial
    * probability C(k,j)pʲqᵏ⁻ʲ. The unbiased estimator is the binomial
    * INVERSION  N̂ₖ = Σⱼ C(j,k)·(−(m−1))^(j−k)·mᵏ · fⱼ  with m = 1/p
    * (for j = k this is the 1/pᵏ weight a fully-surviving cluster earns —
    * the pair case of `dedup_source_overlap_sampled_u10` generalized to
    * every order). With integer m the weights are exact integers, fⱼ are
    * counts, and the whole estimate is integer arithmetic → bit-exact
    * DuckDB replay, fully oracle-gated. Estimates can be negative on a
    * sparse draw (unbiasedness, not positivity, is the guarantee);
    * pct = 100 degenerates to the identity weights and reproduces the
    * exact histogram, which ClusterHistSpec pins.
    */
  def clusterSizeHistSampledU(corpus: DataFrame, pct: Int = 10): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val m = graft.sampling.UniverseSampled.scaleFor(pct)
    val sampled = corpus.filter(graft.sampling.UniverseSampled.keep(col("doc_id"), pct))
    val wDf = histWeights(m)
      .map { case (j, k, w) => (j.toLong, k.toLong, w) }
      .toDF("j", "cluster_size", "w")
    clusterSizeHist(sampled)
      .select(col("cluster_size").as("j"), col("n_clusters").as("f"))
      // LEFT join + loud guard instead of an inner join: an observed
      // sampled cluster larger than MaxHistSize has no inversion weights,
      // and the inner join silently DROPPED it — biasing every estimate
      // low with the oracle replaying the identical drop (gate-blind).
      // The estimator's design ceiling must fail, not lie.
      .join(broadcast(wDf), Seq("j"), "left")
      .withColumn("w",
        when(col("w").isNull,
          raise_error(concat(lit(
            s"DedupRate.clusterSizeHistSampledU: observed sampled cluster size "),
            col("j").cast("string"),
            lit(s" exceeds MaxHistSize=$MaxHistSize — raise the ceiling"))))
          .otherwise(col("w")))
      .groupBy(col("cluster_size"))
      .agg(sum(col("w") * col("f")).cast("long").as("est_n_clusters"))
      .filter(col("est_n_clusters") =!= 0L)
  }

  /** Integer inversion weights (j, k, C(j,k)·(−(m−1))^(j−k)·mᵏ) for
    * 1 ≤ k ≤ j ≤ [[MaxHistSize]]. (−0)⁰ = 1 makes m = 1 the identity.
    */
  private[dedup] def histWeights(m: Long): Seq[(Int, Int, Long)] = {
    def choose(n: Int, r: Int): Long =
      (1 to r).foldLeft(1L)((acc, i) => acc * (n - r + i) / i)
    for {
      j <- 1 to MaxHistSize
      k <- 1 to j
    } yield {
      val sign = if ((j - k) % 2 == 0) 1L else -1L
      val mag = (1 to (j - k)).foldLeft(1L)((acc, _) => acc * (m - 1))
      val mk = (1 to k).foldLeft(1L)((acc, _) => acc * m)
      (j, k, choose(j, k) * sign * mag * mk)
    }
  }

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

  /** Oracle SQL for [[clusterSizeHist]] over the augmented corpus. */
  def clusterSizeHistOracleSql: String =
    s"""WITH corpus AS (${DedupCorpus.augmentSql}),
       |cl AS (SELECT ${Hashing.hash60Sql("text")} AS h, count(*) AS cluster_size
       |       FROM corpus GROUP BY 1)
       |SELECT cluster_size, CAST(count(*) AS BIGINT) AS n_clusters
       |FROM cl GROUP BY 1 ORDER BY cluster_size""".stripMargin

  /** Oracle SQL for [[clusterSizeHistSampledU]]: identical keep-predicate,
    * observed histogram, and integer inversion weights.
    */
  def clusterSizeHistSampledUOracleSql(pct: Int = 10): String = {
    val m = graft.sampling.UniverseSampled.scaleFor(pct)
    val rows = histWeights(m)
      .map { case (j, k, w) => s"($j, $k, ${w}::BIGINT)" }
      .mkString(", ")
    s"""WITH corpus AS (${DedupCorpus.augmentSql}),
       |s AS (SELECT * FROM corpus
       |      WHERE ${graft.sampling.UniverseSampled.keepSql("doc_id", pct)}),
       |cl AS (SELECT ${Hashing.hash60Sql("text")} AS h, count(*) AS j
       |       FROM s GROUP BY 1),
       |f AS (SELECT j, count(*) AS f FROM cl GROUP BY j),
       |w AS (SELECT * FROM (VALUES $rows) AS t(j, cluster_size, w))
       |SELECT CAST(cluster_size AS BIGINT) AS cluster_size,
       |       CAST(sum(w.w * f.f) AS BIGINT) AS est_n_clusters
       |FROM f JOIN w ON f.j = w.j
       |GROUP BY cluster_size
       |HAVING CAST(sum(w.w * f.f) AS BIGINT) <> 0
       |ORDER BY cluster_size""".stripMargin
  }

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
