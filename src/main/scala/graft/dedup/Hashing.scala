package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing and tokenization primitives shared by
  * the dedup / similarity / text-analysis operators.
  *
  * Everything here must be replicable in ANSI-ish SQL so the DuckDB oracle
  * can recompute it: hashes are md5-prefix based (both engines agree on md5
  * of UTF-8 text), not Spark-internal murmur/xxhash (engine-specific).
  * All expressions are codegen'd built-ins — no UDFs in any hot path.
  */
object Hashing {

  /** 60-bit deterministic hash of a string column: first 15 hex chars of
    * md5, read as a base-16 number. DuckDB equivalent:
    * `CAST('0x' || substr(md5(s), 1, 15) AS BIGINT)`.
    * 60 bits keeps it positive in a signed 64-bit long in both engines.
    */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** SQL text of [[hash60]] for DuckDB oracle generation. */
  def hash60Sql(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** Word tokenization shared with the reference word-count pipeline:
    * lower-case, split on non-alphanumerics. DuckDB equivalent:
    * `regexp_split_to_array(lower(text), '[^a-z0-9]+')`.
    */
  def words(text: Column): Column = split(lower(text), "[^a-z0-9]+")

  /** Word k-gram shingles as an array column (docs shorter than k words
    * yield an empty array). DuckDB equivalent:
    * `[array_to_string(words[i:i+k-1], ' ') for i in range(1, len(words)-k+2)]`.
    *
    * PERFORMANCE TRAP: pass a PRE-MATERIALIZED words-array attribute, not
    * `words(text)` inline — expressions captured inside a higher-order
    * function's lambda are re-evaluated PER ELEMENT, so an inline
    * `split(lower(text))` here re-splits the whole document for every
    * shingle (quadratic per doc; measured 4.9 s vs 0.6 s at sf0.1). Use
    * [[explodeShingles]], which does the materialization.
    */
  def shingles(w: Column, k: Int): Column =
    when(size(w) < k, array().cast("array<string>"))
      .otherwise(
        transform(
          sequence(lit(0), size(w) - k),
          i => array_join(slice(w, i + lit(1), lit(k)), " ")))

  /** (doc_id, shingle) rows of `df`'s text column, with the words array
    * materialized as its own projection before the shingle lambda (see
    * [[shingles]]; CollapseProject keeps the alias because a non-cheap
    * expression referenced more than once is never re-inlined).
    */
  def explodeShingles(df: DataFrame, k: Int): DataFrame =
    df.select(col("doc_id"), words(col("text")).as("__w"))
      .select(col("doc_id"), explode(shingles(col("__w"), k)).as("shingle"))
}
