package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication test corpus and exact dedup.
  *
  * The driver's synthetic `documents` table has no duplicates, so the dedup
  * operators would all return empty (and be green-by-vacuity). [[augment]]
  * injects deterministic duplicates — exact copies and near-copies — that
  * both the Spark pipelines and the DuckDB oracle construct identically,
  * giving every dedup query a non-trivial, value-checked result.
  */
object DedupCorpus {

  val ExactDupOffset = 100000L
  val NearDupOffset = 200000L

  /** Id-block size of the scale probe's ×k explodes: copy i of a doc gets
    * id + i·IdBlock, so "the base id" of any exploded row is id mod
    * IdBlock. Every shift-aware predicate (the probe's base-snapshot
    * rule, [[graft.text.Decontaminate]]'s bench slice) and every explode
    * helper must share THIS constant — four independent 1e8 literals had
    * already accumulated before it was named (review r15).
    */
  val IdBlock = 100000000L

  /** documents ∪ exact copies (doc_id % 7 = 0, id + 100000) ∪ near copies
    * with the last two words dropped (doc_id % 11 = 0, id + 200000).
    */
  def augment(documents: DataFrame): DataFrame = {
    // PRECONDITION (not per-row checkable without an extra aggregate
    // job): the base id set must be collision-free under the +[[
    // ExactDupOffset]]/+[[NearDupOffset]] shifts — i.e. no base id equals
    // another base id plus either offset. Dense 0-based fixture ids
    // satisfy it while the corpus stays under ExactDupOffset ids per
    // contiguous block (the scale probe's 10⁸-spaced blocks also satisfy
    // it: shifted ids land in the gap between blocks). A violating corpus
    // would give two texts one key and fan out every downstream id join;
    // DedupCorpusSpec pins collision-freedom on the live fixtures AND on
    // a probe-shaped exploded fixture. (An in-plan raise_error guard on
    // doc_id >= ExactDupOffset was tried and reverted: it false-fires on
    // the probe's block-offset ids, which are collision-free.)
    //
    // every dedup pipeline (shingling, hashing, banding) hangs off this —
    // floor the narrow-stage parallelism once here
    val base = graft.queries.Tables.parallelismFloor(
      documents.select(col("doc_id"), col("text")))
    val exactDups = base
      .filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + ExactDupOffset).as("doc_id"), col("text"))
    val w = Hashing.words(col("text"))
    // greatest(…, 0): Spark's slice throws on a negative length, so a doc
    // with <2 word tokens must degrade to empty text — the oracle SQL
    // clamps identically (a negative DuckDB slice bound would otherwise
    // count from the END and diverge).
    val nearDups = base
      .filter(col("doc_id") % 11 === 0)
      .select(
        (col("doc_id") + NearDupOffset).as("doc_id"),
        array_join(slice(w, lit(1), greatest(size(w) - 2, lit(0))), " ").as("text"))
    base.unionAll(exactDups).unionAll(nearDups)
  }

  /** SQL for the same augmented corpus (DuckDB), over any base relation —
    * `from` defaults to the raw table; the sampled twins pass their
    * keep-filtered CTE so duplicate structure replays over the slice.
    */
  def augmentSqlFrom(from: String = "documents"): String =
    s"""SELECT doc_id, text FROM $from
       |UNION ALL
       |SELECT doc_id + $ExactDupOffset AS doc_id, text FROM $from WHERE doc_id % 7 = 0
       |UNION ALL
       |SELECT doc_id + $NearDupOffset AS doc_id,
       |       array_to_string(w[1:greatest(len(w)-2, 0)], ' ') AS text
       |FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS w
       |      FROM $from)
       |WHERE doc_id % 11 = 0""".stripMargin

  /** SQL for the same augmented corpus (DuckDB). */
  val augmentSql: String = augmentSqlFrom()

  /** [[augment]] with the `source` column carried through (copies inherit
    * their original's source) — the input shape for pipelines that both
    * dedup AND mix by source ([[graft.text.TrainingShard.manifestNearDup]]).
    */
  def augmentWithSource(documents: DataFrame): DataFrame = {
    val base = graft.queries.Tables.parallelismFloor(
      documents.select(col("doc_id"), col("text"), col("source")))
    val exactDups = base
      .filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + ExactDupOffset).as("doc_id"), col("text"), col("source"))
    val w = Hashing.words(col("text"))
    val nearDups = base
      .filter(col("doc_id") % 11 === 0)
      .select(
        (col("doc_id") + NearDupOffset).as("doc_id"),
        array_join(slice(w, lit(1), greatest(size(w) - 2, lit(0))), " ").as("text"),
        col("source"))
    base.unionAll(exactDups).unionAll(nearDups)
  }

  /** SQL for [[augmentWithSource]] (DuckDB), over any base relation. */
  def augmentWithSourceSqlFrom(from: String = "documents"): String =
    s"""SELECT doc_id, text, source FROM $from
       |UNION ALL
       |SELECT doc_id + $ExactDupOffset AS doc_id, text, source FROM $from WHERE doc_id % 7 = 0
       |UNION ALL
       |SELECT doc_id + $NearDupOffset AS doc_id,
       |       array_to_string(w[1:greatest(len(w)-2, 0)], ' ') AS text,
       |       source
       |FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS w, source
       |      FROM $from)
       |WHERE doc_id % 11 = 0""".stripMargin

  /** (doc_id, source) provenance lookup for the SAME augmented id space as
    * [[augment]] — a synthetic duplicate inherits its original's source, so
    * cross-source leakage queries ([[SourceOverlap]]) can label both ends
    * of every near-dup pair. Kept beside [[augment]] because the id-shift
    * rules must never drift between the two.
    */
  def augmentSources(documents: DataFrame): DataFrame = {
    val base = documents.select(col("doc_id"), col("source"))
    base
      .unionAll(base.filter(col("doc_id") % 7 === 0)
        .select((col("doc_id") + ExactDupOffset).as("doc_id"), col("source")))
      .unionAll(base.filter(col("doc_id") % 11 === 0)
        .select((col("doc_id") + NearDupOffset).as("doc_id"), col("source")))
  }

  /** SQL for [[augmentSources]] (DuckDB), over any base relation. */
  def augmentSourcesSqlFrom(from: String = "documents"): String =
    s"""SELECT doc_id, source FROM $from
       |UNION ALL
       |SELECT doc_id + $ExactDupOffset AS doc_id, source FROM $from WHERE doc_id % 7 = 0
       |UNION ALL
       |SELECT doc_id + $NearDupOffset AS doc_id, source FROM $from WHERE doc_id % 11 = 0""".stripMargin

  /** SQL for [[augmentSources]] (DuckDB). */
  val augmentSourcesSql: String = augmentSourcesSqlFrom()

  /** Exact dedup by content hash: one surviving row per distinct text, the
    * smallest doc_id wins, with the duplicate count.
    *
    * Scale shape: groupBy on a 32-char digest — the shuffle carries
    * (digest, id) pairs, never the document bodies; partial aggregation
    * happens map-side. This is the 100 TB-safe exact-dedup plan.
    */
  def exactDedup(corpus: DataFrame): DataFrame =
    corpus
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("dup_cnt"))
      .select("doc_id", "content_hash", "dup_cnt")
}
