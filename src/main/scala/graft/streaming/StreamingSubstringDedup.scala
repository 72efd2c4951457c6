package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.dedup.SubstringDedup

/** Streaming exact-substring excision — the ingest-time shape: every
  * newly arriving document is cut against the STATIC base-corpus gram
  * index, compressed to its Bloom bit table
  * ([[SubstringDedup.indexBloomBits]] — the full index is corpus-sized,
  * its Bloom is `m/8` broadcastable bytes, the
  * [[StreamingDecontaminate]] trade with the opposite polarity: a false
  * positive EXCISES clean text instead of dropping a clean doc, and
  * blooms have no false negatives so every true repeated span IS cut).
  *
  * Works because [[SubstringDedup.summaryPerRowBloom]] is ONE stateless
  * projection — gram hashes, bloom-probed cut positions, and the island
  * merge all run as in-row array ops: no join, no window, no state store
  * — legal in append mode at any trigger and trivially batch ≡ stream
  * per micro-batch (pinned by spec AND by the
  * `docs_substring_stream_replay` oracle row, which runs the SAME
  * per-row form over the batch delta frame through DuckDB).
  *
  * At 100 TB: the bits ride into every task as one broadcast-sized
  * literal; a base-corpus refresh is a stream restart with new bits
  * (the static side of a stream-static join has the same
  * restart-to-refresh contract).
  */
object StreamingSubstringDedup {

  /** Per-arriving-doc excision summary of `stream` (needs doc_id, text)
    * against a prebuilt index Bloom.
    */
  def excise(stream: DataFrame, bits: Array[Long]): DataFrame =
    SubstringDedup.summaryPerRowBloom(stream, bits)
}
