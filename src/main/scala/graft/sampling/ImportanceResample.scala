package graft.sampling

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Data Selection via Importance Resampling (DSIR, Xie et al. 2023,
  * arXiv:2302.03169) re-expressed deterministically: score every document
  * by how much its hashed n-gram feature profile looks like a TARGET
  * subset of the corpus (here `lang = 'en'`, the "match the high-quality
  * reference distribution" use case), then resample with probability
  * proportional to that score.
  *
  * Deviations from the paper, chosen so the operator is integer-exact and
  * oracle-replayable (no floats, no RNG stream):
  *   - features are hashed unigrams + bigrams into [[Buckets]] buckets
  *     (the paper's hashed n-gram model) via the cross-engine md5 family;
  *   - the per-doc score is the token-weighted POSTERIOR p(target | f)
  *     averaged over the document's features — `num/den` with
  *     num = Σ c_f·tcnt_f and den = Σ c_f·rcnt_f — a linear likelihood
  *     ratio rather than the paper's log-likelihood difference (same
  *     ordering signal, exact in integer arithmetic);
  *   - the Gumbel-top-k resample becomes a deterministic Bernoulli: keep
  *     iff u·den < num·[[Scale]] where u = md5-uniform on [0, Scale) —
  *     P(keep) = score, reproducible run-over-run.
  *
  * Scale design (100 TB): the feature stream is one explode over a single
  * words() projection (unigrams and bigrams concat'd per row — ONE scan,
  * one shuffle into the (doc_id, f) partial-aggregating groupBy). The
  * bucket weight tables are [[Buckets]] rows — broadcast, never shuffled.
  * Per-feature products stay under 2⁶³ for corpora to ~10¹⁵ tokens; the
  * SUMS are carried as decimal(38,0) (DuckDB: hugeint), so no overflow
  * path exists short of 10³⁸. The checkpointed feature frame is consumed
  * by three aggregations (raw counts, target counts, doc-feature counts)
  * — without it each would rescan and re-tokenize the corpus.
  */
object ImportanceResample {

  /** Hash-feature vocabulary size (the paper uses 10⁴; 2¹⁰ keeps the
    * broadcast tiny while leaving bucket collisions rare at test scale).
    */
  val Buckets = 1024L

  /** Probability resolution of the deterministic resample. */
  val Scale = 1000000L

  /** Target-subset predicate (the reference distribution to match). */
  val TargetLang = "en"

  /** (doc_id, f) feature stream with the target flag: hashed unigrams and
    * bigrams of the empty-token-filtered word sequence.
    */
  private def features(docs: DataFrame): DataFrame = {
    val wf = array_remove(Hashing.words(col("text")), "")
    docs
      .select(
        col("doc_id"),
        (col("lang") === TargetLang).as("is_target"),
        concat(wf, Hashing.shingles(wf, 2)).as("__t"))
      .select(col("doc_id"), col("is_target"), explode(col("__t")).as("tok"))
      .select(
        col("doc_id"),
        col("is_target"),
        (Hashing.hash60(concat(lit("isrf:"), col("tok"))) % Buckets).as("f"))
  }

  /** (doc_id, score_q): score_q = floor(Scale · Σc·tcnt / Σc·rcnt) ∈
    * [0, Scale] — the integer importance score. Docs with zero features
    * (empty text) carry no distribution signal and are absent, matching
    * the oracle row set.
    */
  def scores(docs: DataFrame): DataFrame = scored(docs)
    .select(col("doc_id"), col("score_q"))

  private def scored(docs: DataFrame): DataFrame = {
    val feats = features(docs).localCheckpoint(false)
    val raw = feats.groupBy("f").agg(count(lit(1)).as("rcnt"))
    val tgt = feats.filter(col("is_target")).groupBy("f").agg(count(lit(1)).as("tcnt"))
    val weights = raw.join(tgt, Seq("f"), "left")
      .select(col("f"), col("rcnt"), coalesce(col("tcnt"), lit(0L)).as("tcnt"))
    feats.groupBy("doc_id", "f").agg(count(lit(1)).as("c"))
      .join(broadcast(weights), Seq("f"))
      .groupBy("doc_id")
      .agg(
        sum((col("c") * col("tcnt")).cast("decimal(38,0)")).as("num"),
        sum((col("c") * col("rcnt")).cast("decimal(38,0)")).as("den"))
      .select(
        col("doc_id"),
        expr(s"($Scale * num) div den").as("score_q"),
        col("num"), col("den"))
  }

  /** The deterministic importance resample: kept docs with their scores.
    * Keep iff u · den < num · Scale, u = md5-uniform in [0, Scale) — i.e.
    * P(keep) = score_q/Scale, exact in the decimal comparison.
    */
  def resample(docs: DataFrame): DataFrame = {
    val u = Hashing.hash60(concat(lit("isru:"), col("doc_id").cast("string"))) % Scale
    scored(docs)
      .filter(u * col("den") < col("num") * lit(Scale))
      .select(col("doc_id"), col("score_q"))
  }

  // ---- DuckDB oracle generation (same constants, same computation) ----

  private def scoredCteSql: String =
    s"""wq AS (
       |  SELECT doc_id, lang,
       |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
       |                     x -> x <> '') AS w
       |  FROM documents
       |),
       |tok AS (
       |  SELECT doc_id, lang, unnest(w) AS tok FROM wq
       |  UNION ALL
       |  SELECT doc_id, lang,
       |         unnest([array_to_string(w[i:i+1], ' ')
       |                 for i in range(1, len(w))]) AS tok
       |  FROM wq
       |),
       |ft AS (
       |  SELECT doc_id, lang = '$TargetLang' AS is_target,
       |         ${Hashing.hash60Sql("'isrf:' || tok")} % $Buckets AS f
       |  FROM tok
       |),
       |raw AS (SELECT f, count(*) AS rcnt FROM ft GROUP BY f),
       |tgt AS (SELECT f, count(*) AS tcnt FROM ft WHERE is_target GROUP BY f),
       |dc AS (SELECT doc_id, f, count(*) AS c FROM ft GROUP BY doc_id, f),
       |s AS (
       |  SELECT dc.doc_id,
       |         sum(dc.c * COALESCE(t.tcnt, 0)) AS num,
       |         sum(dc.c * r.rcnt) AS den
       |  FROM dc JOIN raw r USING (f) LEFT JOIN tgt t USING (f)
       |  GROUP BY dc.doc_id
       |)""".stripMargin

  def scoresOracleSql: String =
    s"""WITH $scoredCteSql
       |SELECT doc_id, CAST(($Scale * num) // den AS BIGINT) AS score_q
       |FROM s ORDER BY doc_id""".stripMargin

  def resampleOracleSql: String =
    s"""WITH $scoredCteSql
       |SELECT doc_id, CAST(($Scale * num) // den AS BIGINT) AS score_q
       |FROM s
       |WHERE (${Hashing.hash60Sql("'isru:' || CAST(doc_id AS VARCHAR)")} % $Scale) * den
       |      < num * $Scale
       |ORDER BY doc_id""".stripMargin
}
