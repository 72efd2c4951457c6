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
}
