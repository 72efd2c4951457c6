package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Corpus document-frequency statistics and per-document top-terms — the
  * classic tf-idf prominence ranking (Salton & Buckley 1988), the feature
  * layer curation heuristics build on: df tables drive stopword discovery,
  * boilerplate detection ("terms in >50 % of documents"), and per-doc
  * keyword extraction.
  *
  * Scoring is ALL-INTEGER so both engines agree bit-for-bit (the doctrine
  * of this codebase — no float log in an oracle-gated path):
  * `score_e6 = tf · 1e6 DIV df` — term frequency df-normalized, the
  * monotone core of tf-idf for a fixed corpus (rank-equivalent to tf/df;
  * the classic `log(N/df)` damping changes WEIGHTS, not the per-term
  * ordering for a single doc at fixed N ... it is monotone in 1/df).
  *
  * Scale shape, start to finish:
  *  1. per-(doc, term) tf: explode + hash aggregate — map-side partials
  *     collapse each doc's repeated terms inside the mapper;
  *  2. df: a SECOND aggregate over the tf table (one row per distinct
  *     (doc, term) already — no re-tokenization, no distinct pass), keyed
  *     by term;
  *  3. tf ⋈ df on term: a hot stopword's build side is ONE row (the df
  *     table has one row per term) and its probe side is at most one row
  *     per document — bounded by design, no salting needed;
  *  4. per-doc top-k by (score desc, word): `row_number ≤ k` →
  *     Catalyst's InferWindowGroupLimit keeps k rows per partition
  *     BEFORE the shuffle (the [[graft.operators.GroupTopK]] pattern).
  * No driver state, no collect, no global sort.
  */
object TfIdf {

  /** Top terms kept per document. */
  val TopK = 5

  /** Minimum term length — single chars are noise for keyword extraction. */
  val MinLen = 2

  /** Per-(doc_id, word) term frequencies over the corpus (words of length
    * ≥ [[MinLen]]).
    */
  def termFreq(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"), explode(Hashing.words(col("text"))).as("word"))
      .filter(length(col("word")) >= MinLen)
      .groupBy(col("doc_id"), col("word"))
      .agg(count(lit(1)).as("tf"))

  /** Document frequency per term, derived from [[termFreq]]'s already-
    * distinct (doc, term) rows.
    */
  def docFreq(tf: DataFrame): DataFrame =
    tf.groupBy(col("word")).agg(count(lit(1)).as("df"))

  /** Per-document top-[[TopK]] terms by integer df-normalized prominence.
    * Output: doc_id, word, tf, df, score_e6, rn (1-based rank).
    */
  def topTerms(docs: DataFrame, k: Int = TopK): DataFrame = {
    // tf feeds both the df aggregate and the join probe — materialize once
    // (the TokenBudget/CrossDocDedup pattern) or the explode+agg runs twice
    val tf = termFreq(docs).localCheckpoint(false)
    val scored = tf
      .join(docFreq(tf), "word")
      .withColumn("score_e6", expr("tf * 1000000 DIV df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score_e6").desc, col("word"))
    scored
      // cast: row_number is int32, but every oracle-gated integer column is
      // BIGINT (DuckDB's window/count results) — the GroupTopK convention
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("doc_id"), col("word"), col("tf"), col("df"),
        col("score_e6"), col("rn"))
  }

  /** The (doc, term) tf CTE — shared by [[topTermsOracleSql]] and
    * [[boilerplateTermsOracleSql]].
    */
  private val TfCteSql: String =
    s"""tf AS (
       |  SELECT doc_id, word, count(*) AS tf
       |  FROM (SELECT doc_id,
       |               unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
       |        FROM documents)
       |  WHERE len(word) >= $MinLen
       |  GROUP BY 1, 2
       |)""".stripMargin

  /** DuckDB oracle for [[topTerms]]. */
  def topTermsOracleSql(k: Int = TopK): String =
    s"""WITH $TfCteSql,
       |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |scored AS (
       |  SELECT tf.doc_id, tf.word, tf.tf, df.df,
       |         tf.tf * 1000000 // df.df AS score_e6
       |  FROM tf JOIN df USING (word)
       |),
       |ranked AS (
       |  SELECT *, row_number() OVER (
       |    PARTITION BY doc_id ORDER BY score_e6 DESC, word) AS rn
       |  FROM scored
       |)
       |SELECT doc_id, word, CAST(tf AS BIGINT) AS tf, CAST(df AS BIGINT) AS df,
       |       CAST(score_e6 AS BIGINT) AS score_e6, CAST(rn AS BIGINT) AS rn
       |FROM ranked WHERE rn <= $k
       |ORDER BY doc_id, rn""".stripMargin

  /** Document-frequency floor (percent of corpus documents) above which a
    * term counts as boilerplate/stopword material.
    */
  val BoilerplateDfPct = 50

  /** Boilerplate/stopword discovery: terms appearing in ≥ `pct` % of
    * corpus documents — the df-table use case the scaladoc names (df
    * tables drive stopword discovery and boilerplate detection); its
    * output is what a curation-rule author pastes into a filter list.
    *
    * Integer arithmetic throughout (`df·100 ≥ n_docs·pct`; `df_bp` =
    * basis-point document frequency). Plan shape: the [[termFreq]]
    * aggregate → the term-keyed [[docFreq]] aggregate → a broadcast
    * cross-join with the ONE-ROW corpus count → filter. Output rows are
    * bounded by the high-df vocabulary (tiny by Zipf), so the result is
    * driver-safe at any corpus size.
    *
    * Output: word, df, n_docs, df_bp — ordered most-frequent first.
    */
  def boilerplateTerms(docs: DataFrame, pct: Int = BoilerplateDfPct): DataFrame = {
    val n = docs.agg(count(lit(1)).as("n_docs"))
    docFreq(termFreq(docs))
      .crossJoin(broadcast(n))
      .filter(col("df") * 100 >= col("n_docs") * pct)
      .select(col("word"), col("df"), col("n_docs"),
        expr("df * 10000 DIV n_docs").as("df_bp"))
  }

  /** DuckDB oracle for [[boilerplateTerms]]. */
  def boilerplateTermsOracleSql(pct: Int = BoilerplateDfPct): String =
    s"""WITH $TfCteSql,
       |df AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
       |n AS (SELECT count(*) AS n_docs FROM documents)
       |SELECT word, CAST(df AS BIGINT) AS df, CAST(n_docs AS BIGINT) AS n_docs,
       |       CAST(df * 10000 // n_docs AS BIGINT) AS df_bp
       |FROM df, n
       |WHERE df * 100 >= n_docs * $pct
       |ORDER BY df DESC, word""".stripMargin
}
