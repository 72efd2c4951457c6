package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}

import graft.sampling.CongressionalSampled

/** Streaming congressional sampling — the ingest-time shape: arriving
  * rows are admitted against a STATIC rate table derived once from a
  * reference corpus snapshot ([[CongressionalSampled.rates]], the batch
  * pipeline's artifact), so every stratum of the incoming feed keeps
  * ~targetK rows per snapshot population with uniform per-group error.
  *
  * Works because the whole decision is stateless per row given the rate
  * table: a stream-static broadcast join (legal in append mode at any
  * trigger — the static side is re-read per micro-batch but AQE-cached as
  * a broadcast) plus the deterministic hash-vs-threshold filter. No
  * aggregation, watermark, or state store; batch ≡ stream per micro-batch
  * (pinned by spec AND by the `events_congressional_stream_replay` oracle
  * row, which runs the SAME per-row form over the batch frame against a
  * keep-set oracle — the two spellings agree through DuckDB).
  *
  * Semantics note (the saved-index discipline of
  * [[graft.dedup.IncrementalDedup]]): `n_exact`/`bp` describe the
  * REFERENCE SNAPSHOT the rates were derived from, not the unbounded
  * stream — the rates are an admission POLICY. As the live population
  * drifts from the snapshot the per-stratum intake drifts with it
  * (rate × arrivals); a re-derivation is a stream restart with a new
  * rate table, exactly the static-side refresh contract of the streaming
  * bloom decontaminator.
  */
object StreamingCongressional {

  /** Rows of `stream` admitted by the static `rates` table — carrying
    * (stratum, n_exact, bp) for downstream HT weighting. `stream` rows
    * with a null stratum or unit are dropped (they could never be
    * admitted deterministically; the batch path pre-filters identically).
    */
  def sample(
      stream: DataFrame, stratum: Column, unit: Column,
      rates: DataFrame): DataFrame =
    CongressionalSampled.sampleWithRates(
      stream.filter(stratum.isNotNull && unit.isNotNull), stratum, unit, rates)
}
