package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.sampling.SamplingConfig

/** The sampling/AQP layer on Structured Streaming — the natural extension
  * the reference never had (its "state" was job metadata in ZooKeeper, not
  * stream state; SURVEY.md §2.6).
  *
  * Composition is identical to batch: the seeded Bernoulli filter sits
  * directly above the source, the windowed aggregation runs on the
  * surviving fraction, and every additive aggregate is HT-scaled by 1/p.
  * Watermarks bound state exactly as in unsampled streaming — sampling
  * SHRINKS state (fewer distinct keys survive), which is the point at
  * 100 TB/day ingest: the approximate stream costs p of the exact one in
  * both CPU and state store.
  */
object StreamingSampled {

  /** Sampled tumbling-window counts per key with HT-scaled estimates.
    *
    * @param events    streaming DataFrame with an event-time column
    * @param tsCol     event-time column name (used for window + watermark)
    * @param keyCol    grouping key column name
    * @param cfg       sampling config (seeded; ratio 1.0 → exact identity)
    * @param windowDur tumbling window duration, e.g. "10 minutes"
    * @param watermark lateness bound, e.g. "20 minutes"
    */
  def windowedCounts(
      events: DataFrame,
      tsCol: String,
      keyCol: String,
      cfg: SamplingConfig,
      windowDur: String,
      watermark: String): DataFrame = {
    val p = cfg.resolvedRatio
    val sampled =
      if (p >= 1.0) events
      else events.filter(rand(cfg.seed) < lit(p))
    sampled
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowDur), col(keyCol))
      .agg(count(lit(1)).as("cnt"))
      .select(
        col("window.start").as("win_start"),
        col(keyCol),
        col("cnt"),
        (col("cnt") / lit(p)).as("est_cnt"))
  }

  /** Streaming exact dedup by id within the watermark horizon — built on
    * `dropDuplicatesWithinWatermark`, so the state store holds ids only as
    * long as late data could still arrive (bounded state, the only kind
    * that survives an unbounded stream).
    */
  def dedupWithinWatermark(
      events: DataFrame,
      tsCol: String,
      idCols: Seq[String],
      watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(idCols.head, idCols.tail: _*)
}
