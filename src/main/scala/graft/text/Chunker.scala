package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Context-window document chunking: split every document into fixed-size
  * overlapping token windows — the preprocessing step for embedding /
  * retrieval indexes and for max-sequence-length training consumption of
  * long documents. The DUAL of [[SequencePacking]] (which concatenates
  * short docs up to a budget): chunking splits long docs down to one.
  *
  * Chunks are [[ChunkTokens]]-token windows advancing by [[Stride]]
  * (overlap = ChunkTokens − Stride, so a span near a boundary appears
  * whole in at least one chunk); the final window truncates at the doc
  * end. Chunk count is `1 + ceil((n − C)/S)` for n > C else 1, all
  * integer. Zero-token docs yield no chunks.
  *
  * Scale design: pure per-row explode — one scan, the words split runs
  * once per row (multi-use `__w` projection, the CollapseProject
  * discipline), sequence+slice inside whole-stage codegen, NO shuffle at
  * all (the declared query's ORDER BY is presentation-only). At 100 TB
  * this is embarrassingly parallel; output size is bounded by
  * input · (1 + overlap/stride).
  */
object Chunker {

  val ChunkTokens = 64
  val Stride = 48

  /** (doc_id, chunk_id, start_tok, n_tok, chunk_text). */
  def chunks(docs: DataFrame, c: Int = ChunkTokens, s: Int = Stride): DataFrame = {
    require(s > 0 && c >= s, s"need 0 < stride <= chunk, got c=$c s=$s")
    graft.queries.Tables.parallelismFloor(docs)
      .select(col("doc_id"), array_remove(Hashing.words(col("text")), "").as("__w"))
      .select(col("doc_id"), col("__w"), size(col("__w")).cast("long").as("n"))
      .filter(col("n") > 0)
      .withColumn("nc",
        when(col("n") <= c, lit(1L))
          .otherwise(lit(1L) + expr(s"(n - $c + ${s - 1}) div $s")))
      .select(
        col("doc_id"), col("__w"), col("n"),
        explode(sequence(lit(0L), col("nc") - 1)).as("chunk_id"))
      .select(
        col("doc_id"),
        col("chunk_id"),
        (col("chunk_id") * s).as("start_tok"),
        least(lit(c.toLong), col("n") - col("chunk_id") * s).as("n_tok"),
        array_join(
          slice(col("__w"), (col("chunk_id") * s + 1).cast("int"), lit(c)), " ")
          .as("chunk_text"))
  }

  def chunksOracleSql(c: Int = ChunkTokens, s: Int = Stride): String =
    s"""WITH w AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
       |                     x -> x <> '') AS w
       |  FROM documents
       |),
       |n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n FROM w WHERE len(w) > 0),
       |e AS (
       |  SELECT doc_id, w, n,
       |         unnest(range(0, CASE WHEN n <= $c THEN 1
       |                              ELSE 1 + (n - $c + ${s - 1}) // $s END)) AS chunk_id
       |  FROM n
       |)
       |SELECT doc_id, chunk_id, chunk_id * $s AS start_tok,
       |       least($c, n - chunk_id * $s) AS n_tok,
       |       array_to_string(w[chunk_id * $s + 1 : chunk_id * $s + $c], ' ') AS chunk_text
       |FROM e ORDER BY doc_id, chunk_id""".stripMargin
}
