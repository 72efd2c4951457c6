package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact edit-distance verification of near-duplicate CANDIDATES — the
  * precision pass after probabilistic pair detection: MinHash banding
  * recalls candidate pairs cheaply but admits false positives near the
  * similarity threshold; Levenshtein distance on the pair's actual texts
  * is the exact confirmation (unit-cost edit distance is identical
  * classic DP in both engines — integer, deterministic, oracle-exact).
  *
  * The scale discipline is the ORDER of the two passes: Levenshtein is
  * O(|a|·|b|) per pair, unpayable corpus-wide, affordable on the
  * LSH-filtered candidate table (pairs ≪ corpus by the banding
  * threshold + bucket caps). Texts join in id-keyed — only candidate
  * ids' documents are fetched, and the pair table, not the corpus,
  * drives both joins. The confirm rule is the integer cross-multiply
  * `edit_dist · 5 ≤ max(len_a, len_b)` (≤ 20 % of the longer text — a
  * relative band, so short and long documents are judged alike).
  */
object EditVerify {

  /** (doc_a, doc_b, edit_dist, confirmed) for every candidate pair. */
  def verifiedPairs(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val a = corpus.select(col("doc_id").as("doc_a"), col("text").as("text_a"))
    val b = corpus.select(col("doc_id").as("doc_b"), col("text").as("text_b"))
    // The DP stage is the bytes-vs-CPU mismatch case: candidate rows are
    // few and small (ids + two texts) but each costs O(|a|·|b|), so AQE's
    // size-based coalescing collapses the post-join stage to one task and
    // the whole verification runs sequentially — measured at sf0.1 as TWO
    // identical single-task ~1.4 s stages, because the final global sort's
    // range-boundary sampling pass re-evaluates the DP child a second
    // time. Two moves fix both: an explicit-width pair-hash repartition
    // between text assembly and the DP projection spreads the work
    // regardless of duplicate-id locality (explicit numPartitions opts
    // this one shuffle out of AQE coalescing; the shuffle is proportional
    // to the LSH-filtered pair table, not the corpus), and a lazy
    // localCheckpoint below the sort cuts the plan so the repartition
    // survives optimization (a bare orderBy directly above it replaces it
    // with its own range exchange) and the sort samples ~30-byte
    // materialized rows instead of re-running the DP.
    val parts = pairs.sparkSession.sessionState.conf.numShufflePartitions
    pairs
      .select(col("doc_a"), col("doc_b"))
      .join(a, "doc_a")
      .join(b, "doc_b")
      .repartition(parts, col("doc_a"), col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("text_a"), col("text_b")).cast("long").as("edit_dist"),
        greatest(length(col("text_a")), length(col("text_b"))).cast("long").as("max_len"))
      .select(col("doc_a"), col("doc_b"), col("edit_dist"),
        (col("edit_dist") * 5 <= col("max_len")).as("confirmed"))
      .localCheckpoint(false)
      .orderBy("doc_a", "doc_b")
  }

  /** [[verifiedPairs]] over the standard MinHash candidates of the
    * augmented corpus.
    */
  def verifiedMinHashPairs(docs: DataFrame): DataFrame = {
    val corpus = DedupCorpus.augment(docs)
    verifiedPairs(corpus, MinHashLSH.nearDupPairs(MinHashLSH.signatures(corpus)))
  }

  /** DuckDB oracle for [[verifiedMinHashPairs]] (the pairs CTE keeps its
    * embedded ORDER BY — legal inside CTE parens, the
    * [[DedupClusters]] splice precedent).
    */
  def verifiedMinHashPairsOracleSql: String =
    s"""WITH pairs AS (${MinHashLSH.nearDupPairsOracleSql()}),
       |corpus AS (${DedupCorpus.augmentSql}),
       |j AS (
       |  SELECT doc_a, doc_b,
       |         CAST(levenshtein(ca.text, cb.text) AS BIGINT) AS edit_dist,
       |         CAST(greatest(length(ca.text), length(cb.text)) AS BIGINT) AS max_len
       |  FROM pairs
       |  JOIN corpus ca ON doc_a = ca.doc_id
       |  JOIN corpus cb ON doc_b = cb.doc_id
       |)
       |SELECT doc_a, doc_b, edit_dist, edit_dist * 5 <= max_len AS confirmed
       |FROM j ORDER BY doc_a, doc_b""".stripMargin
}
