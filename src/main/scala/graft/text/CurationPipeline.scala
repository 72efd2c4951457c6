package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** End-to-end curation verdicts — the composed filter chain a training-data
  * pipeline actually ships, folding the engine's independent per-document
  * signals into ONE keep/drop decision with the first failing rule named
  * (so curation dashboards can attribute loss per rule, the reporting shape
  * of Gopher Table A1 and RefinedWeb Fig. 2's removal-rate funnel):
  *
  *   1. `lang`        — language-ID argmax must be English
  *   2. `short`/`long`— word-count window (Gopher's 50..100k, scaled to
  *                      this corpus's 10..99-word documents)
  *   3. `word_len`    — mean word length outside [3, 10]
  *   4. `special`     — non-alphanumeric character ratio too high
  *   5. `stop`        — stopword ratio too low (gibberish / keyword-stuffing)
  *   6. `repetition`  — duplicate-word or top-word fraction too high
  *   7. `keep`
  *
  * Rule order is part of the contract: a document failing several rules
  * reports the FIRST, mirroring how production funnels attribute removals
  * stage by stage.
  *
  * Scale shape: rules 1–5 come out of ONE fused projection (a single words
  * split feeds the language scores and the quality counters — the same
  * multi-use-attribute discipline as [[TextAnalysis.languageId]]); rule 6
  * joins [[TextAnalysis.repetitionSignals]]'s bounded-state aggregate on
  * doc_id. Nothing here adds a shuffle beyond the repetition family's own
  * two exchanges; the verdict CASE is a codegen'd scalar over the joined
  * row. At 100 TB: scan-dominated, with per-rule loss attribution free in
  * the same pass.
  */
object CurationPipeline {

  val MinWords = 20L
  val MaxWords = 10000L
  val MinMeanWordLen = 3.0
  val MaxMeanWordLen = 10.0
  val MaxSpecialRatio = 0.1
  val MinStopRatio = 0.03
  val MaxDupWordsFrac = 0.7
  val MaxTopWordsFrac = 0.2

  /** Per-document verdicts: doc_id, pred_lang, n_words, mean_word_len,
    * stop_ratio, special_ratio, dup_words_frac, top_words_frac, verdict,
    * keep.
    */
  def verdicts(docs: DataFrame): DataFrame = verdictsWith(docs, Nil)

  /** [[verdicts]] with pass-through grouping columns (e.g. `source` for the
    * per-source funnel) riding the fused projection — zero extra cost, the
    * columns never leave the scan-side row.
    */
  private def verdictsWith(docs: DataFrame, extraCols: Seq[String]): DataFrame = {
    val extras = extraCols.map(col)
    val w = col("__w")
    // signals and ratios come from the ONE shared spelling in
    // [[TextAnalysis.qualitySignalCols]]/[[TextAnalysis.qualityRatioCols]] —
    // the same formulas the corpus is quality-RANKED by
    val sig0 = graft.queries.Tables.parallelismFloor(docs)
      .select(Seq(col("doc_id")) ++ extras ++
        Seq(col("text"), Hashing.words(col("text")).as("__w")): _*)
      .select(
        Seq(col("doc_id")) ++ extras ++
          TextAnalysis.qualitySignalCols(w) ++
          TextAnalysis.langScoreCols(w): _*)
      .withColumn("pred_lang", TextAnalysis.langPredExpr)
    val sig = TextAnalysis.qualityRatioCols
      .foldLeft(sig0) { case (df, (name, c)) => df.withColumn(name, c) }
    val rep = TextAnalysis.repetitionSignals(docs)
      .select(col("doc_id"), col("dup_words_frac"), col("top_words_frac"))
    val verdict =
      when(col("pred_lang") =!= TextAnalysis.Markers.head._1, "lang")
        .when(col("n_words") < MinWords, "short")
        .when(col("n_words") > MaxWords, "long")
        .when(col("mean_word_len") < MinMeanWordLen ||
          col("mean_word_len") > MaxMeanWordLen, "word_len")
        .when(col("special_ratio") > MaxSpecialRatio, "special")
        .when(col("stop_ratio") < MinStopRatio, "stop")
        .when(col("dup_words_frac") > MaxDupWordsFrac ||
          col("top_words_frac") > MaxTopWordsFrac, "repetition")
        .otherwise("keep")
    sig
      .join(rep, Seq("doc_id"), "left")
      .select(Seq(col("doc_id")) ++ extras ++
        Seq(col("pred_lang"), col("n_words"), col("mean_word_len"),
          col("stop_ratio"), col("special_ratio"),
          col("dup_words_frac"), col("top_words_frac"),
          verdict.as("verdict"), (verdict === "keep").as("keep")): _*)
  }

  /** Per-rule loss attribution: documents and token estimate removed by
    * each rule (the funnel chart) — one extra tiny aggregate over
    * [[verdicts]].
    */
  def funnel(docs: DataFrame): DataFrame =
    verdicts(docs)
      .groupBy(col("verdict"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words_total"))

  /** The funnel broken out per SOURCE — the shape curation reports actually
    * publish (Gopher Table A1 / RefinedWeb Fig. 2 attribute removal rates
    * per corpus component): which rule costs which source how many
    * documents and words. The source column rides the fused projection, so
    * this costs the same as [[funnel]] plus one more grouping key.
    */
  def funnelBySource(docs: DataFrame): DataFrame =
    verdictsWith(docs, Seq("source"))
      .groupBy(col("source"), col("verdict"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_words")).as("n_words_total"))

  /** DuckDB oracle for [[verdicts]]. `from` swaps the source relation
    * (e.g. the sampled slice in [[TrainingShard]]'s `_sampled` twin).
    */
  def verdictsOracleSql(from: String = "documents"): String =
    verdictsSqlWith(Nil, from, ordered = true)

  /** The kept-document id set as a composable subquery (consumed by
    * [[TrainingShard]]'s oracle).
    */
  def keptIdsSql(from: String = "documents"): String =
    s"""SELECT doc_id FROM (
       |${verdictsSqlWith(Nil, from, ordered = false)}
       |) WHERE verdict = 'keep'""".stripMargin

  // `ordered` follows the qualityScoreOracleSql convention: composing
  // call sites ask for the clause-free form instead of string-stripping
  // the ORDER BY post-hoc (a .replace that silently breaks if the final
  // clause ever changes shape)
  private def verdictsSqlWith(
      extraCols: Seq[String], from: String = "documents",
      ordered: Boolean = true): String = {
    val exSrc = extraCols.map(c => s", $c").mkString
    val exSig = extraCols.map(c => s", sig.$c").mkString
    val en = TextAnalysis.Markers.head._1
    val stop = TextAnalysis.Markers.head._2.map(m => s"'$m'").mkString("[", ", ", "]")
    s"""WITH w AS (SELECT doc_id$exSrc, text, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS w
       |           FROM $from),
       |sig0 AS (
       |  SELECT doc_id$exSrc,
       |       CAST(length(text) AS BIGINT) AS n_chars,
       |       CAST(len(list_filter(w, t -> t <> '')) AS BIGINT) AS n_words,
       |       CAST(len(list_filter(w, t -> list_contains($stop, t))) AS BIGINT) AS n_stop,
       |       CAST(length(regexp_replace(lower(text), '[a-z0-9 ]', '', 'g')) AS BIGINT)
       |         AS n_special,
       |       ${TextAnalysis.langScoresSql}
       |  FROM w
       |),
       |sig AS (
       |  SELECT *,
       |       ${TextAnalysis.langPredSql} AS pred_lang,
       |       ${TextAnalysis.qualityRatiosSql}
       |  FROM sig0
       |),
       |tok AS (
       |  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
       |  FROM $from
       |),
       |tc AS (SELECT doc_id, t, count(*) AS c FROM tok WHERE t <> '' GROUP BY 1, 2),
       |rep AS (
       |  SELECT doc_id,
       |         CAST(sum(c) - count(*) AS DOUBLE) / sum(c) AS dup_words_frac,
       |         CAST(max(c) AS DOUBLE) / sum(c) AS top_words_frac
       |  FROM tc GROUP BY doc_id
       |),
       |v AS (
       |  SELECT sig.doc_id$exSig, pred_lang, n_words, mean_word_len, stop_ratio, special_ratio,
       |         dup_words_frac, top_words_frac,
       |         CASE WHEN pred_lang <> '$en' THEN 'lang'
       |              WHEN n_words < $MinWords THEN 'short'
       |              WHEN n_words > $MaxWords THEN 'long'
       |              WHEN mean_word_len < $MinMeanWordLen
       |                OR mean_word_len > $MaxMeanWordLen THEN 'word_len'
       |              WHEN special_ratio > $MaxSpecialRatio THEN 'special'
       |              WHEN stop_ratio < $MinStopRatio THEN 'stop'
       |              WHEN dup_words_frac > $MaxDupWordsFrac
       |                OR top_words_frac > $MaxTopWordsFrac THEN 'repetition'
       |              ELSE 'keep' END AS verdict
       |  FROM sig LEFT JOIN rep ON sig.doc_id = rep.doc_id
       |)
       |SELECT *, (verdict = 'keep') AS keep FROM v${if (ordered) " ORDER BY doc_id" else ""}""".stripMargin
  }

  /** DuckDB oracle for [[funnel]]. */
  def funnelOracleSql: String =
    s"""WITH v AS (${verdictsSqlWith(Nil, ordered = false)})
       |SELECT verdict, count(*) AS n_docs,
       |       CAST(sum(n_words) AS BIGINT) AS n_words_total
       |FROM v GROUP BY verdict ORDER BY verdict""".stripMargin

  /** DuckDB oracle for [[funnelBySource]]. */
  def funnelBySourceOracleSql: String =
    s"""WITH v AS (${verdictsSqlWith(Seq("source"), ordered = false)})
       |SELECT source, verdict, count(*) AS n_docs,
       |       CAST(sum(n_words) AS BIGINT) AS n_words_total
       |FROM v GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
