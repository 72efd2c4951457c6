package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.MinHashLSH

/** Streaming near-duplicate detection against a STATIC signature index —
  * the incremental-ingest shape of a training-data pipeline: every newly
  * arriving document is checked against the existing corpus WITHOUT
  * recomputing anything about the corpus.
  *
  * Works because [[MinHashLSH.signaturesPerRow]] is a pure per-row
  * projection (no aggregation), so it runs inside a streaming select with
  * no output mode or watermark requirements, and the candidate generation
  * is a STREAM-STATIC equi-join on (band, key) — stateless on the stream
  * side, supported in append mode. At scale the static side is the saved
  * signature table (a parquet artifact, refreshed by the batch pipeline);
  * Spark broadcasts or shuffles it once per query start, not per batch.
  *
  * OR-construction note: a pair whose signatures collide in several bands
  * emits once per matching band; `distinct` is not available stateless in
  * a stream, so output is deduped per micro-batch downstream (the spec
  * does exactly that) or with `dropDuplicatesWithinWatermark` when an
  * event-time column exists. A skew cap belongs on the INDEX side: drop
  * over-sized (band, key) buckets from the static table before starting
  * the stream (same guard as [[MinHashLSH.nearDupPairs]]).
  */
object StreamingDedup {

  /** (doc_id, index_doc, band, sim) for every incoming doc whose signature
    * shares a band bucket with an index doc and whose signature similarity
    * is ≥ `minSim`. `stream` needs (doc_id, text); `indexSigs` is a
    * [[MinHashLSH.signatures]]-shaped static table.
    */
  def nearDupsAgainstIndex(
      stream: DataFrame,
      indexSigs: DataFrame,
      minSim: Double = 0.5): DataFrame = {
    val streamBanded = MinHashLSH.bandedSignatures(MinHashLSH.signaturesPerRow(stream))
    val sigNames = (0 until MinHashLSH.NumHashes).map(j => s"m$j")
    val indexBanded = sigNames
      .foldLeft(MinHashLSH.bandedSignatures(indexSigs)
        .withColumnRenamed("doc_id", "index_doc")) {
        case (df, m) => df.withColumnRenamed(m, s"i_$m")
      }
    val matches: Column = sigNames
      .map(m => when(col(m) === col(s"i_$m"), 1).otherwise(0))
      .reduce[Column](_ + _)
      .cast("double") / MinHashLSH.NumHashes
    streamBanded
      .join(indexBanded, Seq("band", "key"))
      .filter(col("doc_id") =!= col("index_doc"))
      .select(col("doc_id"), col("index_doc"), col("band"), matches.as("sim"))
      .filter(col("sim") >= minSim)
  }
}
