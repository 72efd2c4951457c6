package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Intra-document repetition removal — the curation pass that drops repeated
  * paragraphs WITHIN a document (boilerplate headers/footers, templated
  * blocks, scraper echo), keeping each paragraph's first occurrence in
  * order. Complements the cross-document dedup family
  * ([[graft.dedup.DedupCorpus]] etc.), which never looks inside a doc.
  *
  * Scale shape: ENTIRELY per-row array computation — split on blank lines,
  * first-occurrence filter, re-join — no explode, no shuffle, no state
  * beyond one paragraphs array per row. At 100 TB this is scan-dominated
  * and embarrassingly parallel, the cheapest possible operator shape.
  * The first-occurrence filter is O(P²) in the PARAGRAPH count per doc
  * (tens, not thousands), never in characters.
  *
  * The fixture corpus has no blank lines, so [[withParagraphs]] reshapes it
  * deterministically (10-word chunks joined by blank lines, with a repeated
  * paragraph injected for every doc_id % 3 == 0) — the same
  * deterministic-injection protocol [[graft.dedup.DedupCorpus.augment]]
  * established, and equally replayable in the DuckDB oracle.
  */
object Derepeat {

  /** Words per synthesized paragraph. */
  val ParaWords = 10

  /** The blank-line paragraph separator. */
  val ParaSep = "\n\n"

  /** Deterministic paragraph reshaping of the corpus: tokenize
    * ([[Hashing.words]]), chunk into [[ParaWords]]-word paragraphs, join
    * with blank lines; docs with doc_id % 3 == 0 get their first paragraph
    * appended again (the injected repetition the operator must remove).
    */
  def withParagraphs(docs: DataFrame): DataFrame = {
    // `__w` is referenced by the chunk-count AND the slice lambda →
    // CollapseProject keeps the alias, so the doc tokenizes once (the HOF
    // re-inline trap, [[Hashing.shingles]]).
    val w = col("__w")
    val nPar = ceil(size(w).cast("double") / ParaWords).cast("int")
    val ps = when(size(w) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nPar - 1),
        i => array_join(slice(w, i * ParaWords + 1, lit(ParaWords)), " ")))
    graft.queries.Tables.parallelismFloor(docs)
      .select(col("doc_id"), Hashing.words(col("text")).as("__w"))
      .select(col("doc_id"), ps.as("__ps"))
      .select(col("doc_id"),
        array_join(
          when(col("doc_id") % 3 === 0 && size(col("__ps")) >= 1,
            concat(col("__ps"), slice(col("__ps"), 1, 1)))
            .otherwise(col("__ps")),
          ParaSep).as("text"))
  }

  /** Drop repeated paragraphs, keeping first occurrences in document order.
    * Output: doc_id, n_paras (before), n_kept (after), text (cleaned).
    */
  def derepeated(docs: DataFrame): DataFrame = {
    val p = col("__p")
    // keep element i (0-based) iff it does not appear among the preceding i
    // elements — array_position over the 1-based prefix slice returns 0 for
    // "absent". `__p` is multi-use (filter source + lambda slice) → stays a
    // materialized attribute.
    val kept = filter(p, (para, i) => array_position(slice(p, lit(1), i), para) === 0)
    docs
      .select(col("doc_id"), split(col("text"), ParaSep).as("__p"))
      .select(col("doc_id"), size(p).cast("long").as("n_paras"), kept.as("__kept"))
      .select(col("doc_id"), col("n_paras"),
        size(col("__kept")).cast("long").as("n_kept"),
        array_join(col("__kept"), ParaSep).as("text"))
  }

  /** DuckDB oracle: synthesis + first-occurrence removal, end to end. */
  def derepeatOracleSql(table: String = "documents"): String =
    s"""WITH w AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS w FROM $table
       |),
       |paras0 AS (
       |  SELECT doc_id,
       |    [array_to_string(w[(i-1)*$ParaWords+1:i*$ParaWords], ' ')
       |     for i in range(1, CAST(ceil(len(w)/$ParaWords.0) AS BIGINT)+1)] AS ps
       |  FROM w
       |),
       |paras AS (
       |  SELECT doc_id,
       |    CASE WHEN doc_id % 3 = 0 AND len(ps) >= 1
       |         THEN list_append(ps, ps[1]) ELSE ps END AS ps
       |  FROM paras0
       |),
       |ex AS (
       |  SELECT doc_id, unnest(ps) AS para, generate_subscripts(ps, 1) AS idx FROM paras
       |),
       |firsts AS (
       |  SELECT doc_id, para, idx, min(idx) OVER (PARTITION BY doc_id, para) AS fidx,
       |         count(*) OVER (PARTITION BY doc_id) AS np
       |  FROM ex
       |)
       |SELECT doc_id,
       |  CAST(any_value(np) AS BIGINT) AS n_paras,
       |  CAST(count(*) AS BIGINT) AS n_kept,
       |  string_agg(para, chr(10)||chr(10) ORDER BY idx) AS text
       |FROM firsts
       |WHERE idx = fidx
       |GROUP BY doc_id
       |ORDER BY doc_id""".stripMargin
}
