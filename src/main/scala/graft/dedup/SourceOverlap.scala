package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cross-source duplication matrix: near-duplicate PAIR counts labelled by
  * the source of each end — the corpus-provenance question behind
  * train/eval leakage and licensing audits ("how much of source A is a
  * near-copy of source B?"; cf. Lee et al., "Deduplicating Training Data
  * Makes Language Models Better", ACL 2022, which measures exactly this
  * cross-split leakage).
  *
  * Scale shape: the pair table is the output of banded LSH (≪ corpus), and
  * the provenance lookup is a 2-column projection of the corpus — both
  * joins are keyed on doc_id and shuffle only (id, source) pairs, never
  * text or signatures. The result is bounded by |sources|² regardless of
  * corpus size; the (lo, hi) canonical ordering makes the matrix
  * upper-triangular so A~B and B~A land in one cell. `avg(sim)` is exact
  * across engines: MinHash sims are multiples of 1/16 (dyadic rationals),
  * so the double sum is associative-safe and the oracle hash-matches.
  */
object SourceOverlap {

  /** source_lo, source_hi, pair_cnt, avg_sim over the augmented corpus. */
  def pairsBySource(documents: DataFrame): DataFrame = {
    val corpus = DedupCorpus.augment(documents)
    val pairs = MinHashLSH.nearDupPairs(MinHashLSH.signatures(corpus))
    val srcs = DedupCorpus.augmentSources(documents)
    pairs
      .join(srcs.select(col("doc_id").as("doc_a"), col("source").as("src_a")), Seq("doc_a"))
      .join(srcs.select(col("doc_id").as("doc_b"), col("source").as("src_b")), Seq("doc_b"))
      .groupBy(
        least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .agg(count(lit(1)).as("pair_cnt"), avg(col("sim")).as("avg_sim"))
  }

  /** Oracle SQL: the full MinHash pair oracle as a CTE, provenance-labelled
    * and rolled up identically.
    */
  def pairsBySourceOracleSql: String =
    s"""WITH pairs AS (${MinHashLSH.nearDupPairsOracleSql()}),
       |srcs AS (${DedupCorpus.augmentSourcesSql}),
       |lab AS (
       |  SELECT least(sa.source, sb.source) AS source_lo,
       |         greatest(sa.source, sb.source) AS source_hi,
       |         p.sim
       |  FROM pairs p
       |  JOIN srcs sa ON p.doc_a = sa.doc_id
       |  JOIN srcs sb ON p.doc_b = sb.doc_id
       |)
       |SELECT source_lo, source_hi, count(*) AS pair_cnt, avg(sim) AS avg_sim
       |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Strip the synthetic-duplicate id offsets back to the BASE document id
    * — pair-inclusion probability under doc-atomic sampling is decided per
    * base document, and a synthetic copy is kept iff its base is.
    */
  private def baseId(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(c >= DedupCorpus.NearDupOffset, c - DedupCorpus.NearDupOffset)
      .when(c >= DedupCorpus.ExactDupOffset, c - DedupCorpus.ExactDupOffset)
      .otherwise(c)

  private def baseIdSql(e: String): String =
    s"""CASE WHEN $e >= ${DedupCorpus.NearDupOffset} THEN $e - ${DedupCorpus.NearDupOffset}
       |     WHEN $e >= ${DedupCorpus.ExactDupOffset} THEN $e - ${DedupCorpus.ExactDupOffset}
       |     ELSE $e END""".stripMargin

  /** UNIVERSE-SAMPLED estimator of [[pairsBySource]]: a doc-atomic `pct` %
    * hash-range sample of the BASE corpus, LSH pairs over the sampled
    * slice, then pair-level Horvitz–Thompson with MIXED inclusion orders —
    * the second-order-HT wrinkle the single-table `_u10` twins never hit:
    *
    *  - a pair whose two ends share a base document (an injected
    *    duplicate and its original travel together under doc-atomic
    *    sampling) is observed with probability p → weight 1/p;
    *  - a pair spanning two base documents needs BOTH kept —
    *    probability p² → weight 1/p².
    *
    * Pair detection is pairwise-deterministic (band-key equality of two
    * signatures), so a full-corpus pair is observed iff its bases are kept
    * — the HT estimate is unbiased for the full matrix (modulo the bucket
    * cap, a no-op off degenerate corpora). Weights are exact integers
    * (100/pct, squared) and sims are /16 dyadics, so `est_pair_cnt` and
    * the weighted mean replay bit-exactly in DuckDB: fully oracle-gated
    * like the other `_u10` twins. Output: source_lo, source_hi,
    * est_pair_cnt, avg_sim_w.
    */
  def pairsBySourceSampled(documents: DataFrame, pct: Int = 10): DataFrame = {
    require(100 % pct == 0, s"pct must divide 100, got $pct")
    val m = graft.sampling.UniverseSampled.scaleFor(pct).toInt
    val sampled = graft.sampling.UniverseSampled.sample(documents, col("doc_id"), pct)
    val corpus = DedupCorpus.augment(sampled)
    val pairs = MinHashLSH.nearDupPairs(MinHashLSH.signatures(corpus))
    val srcs = DedupCorpus.augmentSources(sampled)
    pairs
      .join(srcs.select(col("doc_id").as("doc_a"), col("source").as("src_a")), Seq("doc_a"))
      .join(srcs.select(col("doc_id").as("doc_b"), col("source").as("src_b")), Seq("doc_b"))
      .withColumn("w",
        when(baseId(col("doc_a")) === baseId(col("doc_b")), lit(m.toLong))
          .otherwise(lit(m.toLong * m)))
      .groupBy(
        least(col("src_a"), col("src_b")).as("source_lo"),
        greatest(col("src_a"), col("src_b")).as("source_hi"))
      .agg(
        sum(col("w")).as("est_pair_cnt"),
        (sum(col("w").cast("double") * col("sim")) / sum(col("w")).cast("double"))
          .as("avg_sim_w"))
  }

  /** Oracle SQL for [[pairsBySourceSampled]]: identical keep-predicate,
    * augment, pair CTE, base-id weights, and weighted roll-up.
    */
  def pairsBySourceSampledOracleSql(pct: Int = 10): String = {
    val m = graft.sampling.UniverseSampled.scaleFor(pct).toInt
    s"""WITH sdocs AS (SELECT * FROM documents
       |               WHERE ${graft.sampling.UniverseSampled.keepSql("doc_id", pct)}),
       |pairs AS (${MinHashLSH.nearDupPairsOracleSql(from = "sdocs")}),
       |srcs AS (${DedupCorpus.augmentSourcesSqlFrom("sdocs")}),
       |lab AS (
       |  SELECT least(sa.source, sb.source) AS source_lo,
       |         greatest(sa.source, sb.source) AS source_hi,
       |         CASE WHEN (${baseIdSql("p.doc_a")}) = (${baseIdSql("p.doc_b")})
       |              THEN ${m.toLong} ELSE ${m.toLong * m} END AS w,
       |         p.sim
       |  FROM pairs p
       |  JOIN srcs sa ON p.doc_a = sa.doc_id
       |  JOIN srcs sb ON p.doc_b = sb.doc_id
       |)
       |SELECT source_lo, source_hi,
       |       CAST(sum(w) AS BIGINT) AS est_pair_cnt,
       |       sum(CAST(w AS DOUBLE) * sim) / CAST(sum(w) AS DOUBLE) AS avg_sim_w
       |FROM lab GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
  }
}
