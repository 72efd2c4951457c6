package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.text.Decontaminate

/** Streaming benchmark decontamination — the ingest-time shape: every
  * newly arriving document is checked against the STATIC benchmark Bloom
  * table ([[Decontaminate.benchBloomBits]], the `m/8`-byte artifact the
  * batch pipeline builds once) and dropped on any gram hit, BEFORE it ever
  * lands in the training corpus.
  *
  * Works because the whole check is [[Decontaminate.cleanBloomPerRow]] —
  * one stateless projection + filter (`exists` over the in-row shingle
  * array probing the codegen'd `bloom_might_contain`): no aggregation, no
  * join, no watermark, no state store — legal in append mode at any
  * trigger, and trivially batch ≡ stream per micro-batch (pinned by spec
  * AND by the `docs_decontaminated_stream_replay` oracle row, which runs
  * the SAME per-row form over the batch frame against the SAME oracle SQL
  * as the explode-path bloom query — proving the two spellings agree
  * through DuckDB, not just against each other).
  *
  * At 100 TB: the bits ride into every task as one broadcast-sized
  * reference object; a benchmark-suite refresh is a stream restart with
  * new bits (the static side of a stream-static join has the same
  * restart-to-refresh contract).
  */
object StreamingDecontaminate {

  /** The surviving (clean) documents of `stream` — (doc_id, n_chars).
    * `stream` needs (doc_id, text, n_chars); `bits` is a
    * [[Decontaminate.benchBloomBits]] table.
    */
  def clean(stream: DataFrame, bits: Array[Long], k: Int = Decontaminate.GramK): DataFrame =
    Decontaminate.cleanBloomPerRow(stream, bits, k)
}
