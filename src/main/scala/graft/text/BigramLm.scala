package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained bigram language-model likelihood scoring — the
  * perplexity-filter stage of web-corpus curation (CCNet, Wenzek et al.
  * 2020: score every document under a small LM and drop the
  * least-predictable tail, which is disproportionately boilerplate,
  * markup debris and encoding garbage). A 5-gram KenLM is the classic
  * scorer; the distributed-shape point is identical at any order, so this
  * trains the order-2 model ON THE CORPUS ITSELF — two aggregate passes —
  * and scores each document under it in one more join pass.
  *
  * Scoring is ALL-INTEGER (the [[TfIdf]] doctrine — no float log in an
  * oracle-gated path): instead of summing log-probabilities, each bigram
  * contributes its Laplace-smoothed conditional probability in
  * fixed-point,
  * `p_e6(w1 w2) = (c(w1 w2) + 1) · 10⁶ DIV (c(w1) + V)`,
  * and a document's score is the frequency-weighted MEAN `p_e6` over its
  * bigrams (0 for docs with none). Mean-probability ranks low exactly
  * where mean-log-probability does for the filter's purpose — garbled
  * text is garbled because most of its transitions are rare, not because
  * of a few catastrophic ones that only the log's tail-emphasis would
  * catch — and every division is positive-integer `DIV`, so DuckDB
  * replays the score bit-for-bit.
  *
  * Scale shape, start to finish (nothing doc-length-squared, nothing
  * driver-side):
  *  1. unigram counts: one explode → hash aggregate on word (map-side
  *     partials); V = one count over that table, a one-row broadcast;
  *  2. per-(doc, bigram) multiplicities via the codegen'd
  *     [[graft.functions.WordShingles]] kernel (k = 2), checkpointed once
  *     — this table feeds BOTH the global bigram counts and the scoring
  *     probe, the [[TfIdf]] materialize-once pattern;
  *  3. global bigram counts: a second aggregate over those
  *     already-collapsed rows, keyed by bigram;
  *  4. scoring: bigram-keyed then word-keyed 1:1 joins (the count tables
  *     have one row per key, so a hot bigram's build side is ONE row and
  *     its probe side at most one row per document — bounded by design,
  *     the TfIdf join argument), then one doc-keyed aggregate.
  *
  * Tokens are the house word-split with EDGE delimiters stripped first
  * (`^[^a-z0-9]+|[^a-z0-9]+$`), so the token stream carries no empty
  * strings and bigrams are exactly the adjacent-word pairs.
  */
object BigramLm {

  /** Fixed-point probability scale. */
  val Scale = 1000000L

  private def wordsCol =
    split(
      regexp_replace(lower(col("text")), "^[^a-z0-9]+|[^a-z0-9]+$", ""),
      "[^a-z0-9]+")

  /** (doc_id, n_bigrams, lm_score_e6) for every document of `docs` —
    * lm_score_e6 the mean smoothed bigram probability ×10⁶ under the
    * corpus-trained model, 0 for docs with fewer than two tokens.
    */
  def scores(docs: DataFrame): DataFrame = {
    // unigram counts feed both V and the scoring join — materialize once
    val uni = docs
      .select(explode(wordsCol).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as("cu"))
      .localCheckpoint(false)
    val v = uni.agg(count(lit(1)).as("v"))
    val bgc = docs
      .select(col("doc_id"), wordsCol.as("__w"))
      .select(col("doc_id"),
        explode(graft.dedup.Hashing.shingles(col("__w"), 2)).as("bigram"))
      .groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("k"))
      .localCheckpoint(false)
    val cb = bgc.groupBy(col("bigram")).agg(sum(col("k")).as("cb"))
    val agg = bgc
      .join(cb, "bigram")
      .withColumn("w1", split(col("bigram"), " ").getItem(0))
      .join(uni.withColumnRenamed("word", "w1"), "w1")
      .crossJoin(broadcast(v))
      .groupBy(col("doc_id"))
      .agg(
        sum(col("k")).as("n_bigrams"),
        sum(col("k") * expr(s"(cb + 1) * ${Scale}L div (cu + v)")).as("num"))
    docs.select(col("doc_id"))
      .join(agg, Seq("doc_id"), "left")
      .select(
        col("doc_id"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(expr("num div n_bigrams"), lit(0L)).as("lm_score_e6"))
  }
  // presentation ordering stays at the call site (the qualityScore /
  // tokenCounts convention) — an inline corpus-wide orderBy would bake a
  // global range sort into the operator the scale story says it must not
  // have

  /** DuckDB oracle: the same strip-edges split, the same two count
    * tables, the same integer fixed-point score.
    */
  def scoresOracleSql: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         regexp_split_to_array(
       |           regexp_replace(lower(text), '^[^a-z0-9]+|[^a-z0-9]+$$', '', 'g'),
       |           '[^a-z0-9]+') AS w
       |  FROM documents),
       |uni AS (SELECT unnest(w) AS word FROM toks),
       |cu AS (SELECT word, count(*) AS cu FROM uni WHERE word <> '' GROUP BY 1),
       |vv AS (SELECT count(*) AS v FROM cu),
       |bg AS (SELECT doc_id,
       |              unnest([array_to_string(w[i:i+1], ' ')
       |                      for i in range(1, len(w))]) AS bigram
       |       FROM toks),
       |bgc AS (SELECT doc_id, bigram, count(*) AS k FROM bg GROUP BY 1, 2),
       |cb AS (SELECT bigram, CAST(sum(k) AS BIGINT) AS cb FROM bgc GROUP BY 1),
       |agg AS (SELECT bgc.doc_id,
       |               CAST(sum(k) AS BIGINT) AS n_bigrams,
       |               CAST(sum(k * ((cb.cb + 1) * ${Scale} // (cu.cu + vv.v)))
       |                    AS BIGINT) AS num
       |        FROM bgc JOIN cb USING (bigram)
       |        JOIN cu ON split_part(bigram, ' ', 1) = cu.word
       |        CROSS JOIN vv
       |        GROUP BY 1)
       |SELECT d.doc_id,
       |       coalesce(agg.n_bigrams, 0) AS n_bigrams,
       |       coalesce(agg.num // agg.n_bigrams, 0) AS lm_score_e6
       |FROM documents d LEFT JOIN agg ON d.doc_id = agg.doc_id
       |ORDER BY d.doc_id""".stripMargin
}
