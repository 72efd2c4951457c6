package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream windowed event attribution — the one Structured
  * Streaming join shape the engine's streaming surface lacked: two LIVE
  * streams (clicks, purchases) joined on user with an event-time range
  * condition, the canonical "attribute each purchase to the clicks that
  * preceded it within the attribution window" pipeline.
  *
  * Semantics: a (click, purchase) pair is emitted iff they share a user
  * and `0 < purchase_ts − click_ts ≤ [[WindowUs]]` (strictly after the
  * click — the [[graft.operators.SequenceFunnel]] strictness convention —
  * and at most the window later). Gaps are integer epoch micros, so every
  * output value replays bit-for-bit in the DuckDB oracle.
  *
  * Streaming contract: BOTH sides carry a [[WatermarkDelay]] watermark and
  * the range condition bounds each side's event time by the other's, so
  * Spark evicts click state older than `purchaseWatermark − window` and
  * purchase state older than `clickWatermark` — per-user state is bounded
  * by (delay + window) of activity regardless of stream length. Inner
  * joins emit pairs as soon as both sides arrive (no watermark wait on
  * the EMIT path), so the triggered output equals the batch join — pinned
  * by StreamingAttributionSpec across out-of-order micro-batches, and by
  * the late-click case: a click arriving after the purchase watermark
  * passed its window can no longer match (state already evicted).
  *
  * Scale design (100 TB): one ONE-pipeline definition ([[pairs]]) serves
  * the triggered query AND the batch replay (`withWatermark` is a no-op
  * on a batch frame), so the declared gate exercises the exact streaming
  * plan. Both sides shuffle once on `user_id` (the stream-stream join's
  * state key); event-type filters sit in the scans (pushed to parquet in
  * the batch replay). Output is bounded by per-user click rate × window —
  * the self-join never goes quadratic in a user's history because the
  * range condition is part of the JOIN predicate, not a post-filter.
  */
object StreamingAttribution {

  /** Attribution window: 4 hours, in epoch micros. */
  val WindowUs: Long = 4L * 3600L * 1000000L

  /** Allowed out-of-orderness on both streams. */
  val WatermarkDelay: String = "30 minutes"

  /** The click side: (cuser, click_id, click_ts). The user key is renamed
    * so the join condition never touches two same-name attributes of one
    * parent frame (no ambiguous-self-join resolution in the batch replay).
    */
  def clicksOf(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "click")
      .select(
        col("user_id").as("cuser"),
        col("event_id").as("click_id"),
        col("ts").as("click_ts"))

  /** The purchase side: (user_id, purchase_id, purchase_ts). */
  def purchasesOf(events: DataFrame): DataFrame =
    events.filter(col("event_type") === "purchase")
      .select(
        col("user_id"),
        col("event_id").as("purchase_id"),
        col("ts").as("purchase_ts"))

  /** The shared pair join — works unchanged on two streaming frames and
    * on two batch frames: watermarks are applied HERE (no-ops in batch)
    * and the time-range bound lives in the join condition (required for
    * streaming state cleanup; also what keeps the batch self-join from
    * pairing a user's full history quadratically).
    *
    * The bound is spelled `purchase_ts <= click_ts + INTERVAL 4 HOURS` —
    * the timestamp±interval shape Spark's StreamingJoinHelper parses into
    * state-eviction watermarks; an arithmetically equal `unix_micros`
    * difference would run but keep join state FOREVER (no derivable
    * bound). Timestamps are micro-precision, so the interval form and the
    * oracle's epoch-micros subtraction agree exactly.
    *
    * Output: (click_id, purchase_id, user_id, gap_us), gap in (0, window].
    */
  /** The shared join condition — user equality + the in-window range. */
  private def joinCond =
    col("cuser") === col("user_id") &&
      col("purchase_ts") > col("click_ts") &&
      col("purchase_ts") <=
        col("click_ts") + expr(s"INTERVAL ${WindowUs / 1000000L} SECONDS")

  def pairs(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", WatermarkDelay)
    val p = purchases.withWatermark("purchase_ts", WatermarkDelay)
    c.join(p, joinCond)
      .select(
        col("click_id"),
        col("purchase_id"),
        col("user_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
  }

  /** Batch replay of the streaming pipeline over one events frame — the
    * identical [[pairs]] plan (watermarks inert), declared and gated as
    * `events_attribution_stream_replay`.
    */
  def pairsBatchReplay(events: DataFrame): DataFrame =
    pairs(clicksOf(events), purchasesOf(events))

  /** LEFT-OUTER stream-stream join, purchases retained: matched pairs
    * emit as both sides arrive; an unmatched purchase emits with null
    * click columns only once the CLICK watermark passes its timestamp (no
    * earlier click can still arrive — the outer-emission contract the
    * spec pins with a watermark-advancing sentinel batch). Same state
    * bounds as [[pairs]].
    */
  def pairsLeftOuter(clicks: DataFrame, purchases: DataFrame): DataFrame = {
    val c = clicks.withWatermark("click_ts", WatermarkDelay)
    val p = purchases.withWatermark("purchase_ts", WatermarkDelay)
    p.join(c, joinCond, "left_outer")
      .select(
        col("purchase_id"),
        col("user_id"),
        col("click_id"),
        (unix_micros(col("purchase_ts")) - unix_micros(col("click_ts"))).as("gap_us"))
  }

  /** ORGANIC purchases — no click by the same user in the preceding
    * window: the batch LEFT-ANTI spelling of [[pairsLeftOuter]]'s null
    * rows (spec-pinned equal), declared and gated as
    * `events_attribution_organic`. Output keeps the purchase timestamp as
    * integer micros so the row is self-describing.
    */
  def organic(events: DataFrame): DataFrame =
    purchasesOf(events)
      .join(clicksOf(events), joinCond, "left_anti")
      .select(
        col("purchase_id"),
        col("user_id"),
        unix_micros(col("purchase_ts")).as("purchase_us"))

  /** LAST-TOUCH attribution: for every purchase, the single most recent
    * in-window click (smallest gap; ties — two clicks on the same
    * microsecond — break to the smaller click_id) plus the total number
    * of in-window clicks. One map-side-combining `min(struct(gap_us,
    * click_id))` argmax over the pair table — no per-user ordered window
    * scan; the aggregate state is one struct per purchase.
    */
  def lastTouch(events: DataFrame): DataFrame =
    pairsBatchReplay(events)
      .groupBy(col("purchase_id"), col("user_id"))
      .agg(
        min(struct(col("gap_us"), col("click_id"))).as("__w"),
        count(lit(1)).as("n_clicks"))
      .select(
        col("purchase_id"),
        col("user_id"),
        col("__w.click_id").as("click_id"),
        col("__w.gap_us").as("gap_us"),
        col("n_clicks"))

  /** USER-atomic universe-sampled estimator (the [[graft.sampling.JoinSampled]]
    * argument applied to the new join): both ends of an attribution pair
    * share a user, so keeping whole USERS at p gives every pair inclusion
    * probability p — first-order ×(1/p) Horvitz–Thompson on the pair
    * count, where independent row sampling would square the rate. The
    * keep-filter sits below BOTH sides of the join, so at cluster scale
    * the sample cuts both exchanges ×p. One summary row:
    * (kept_pairs, est_pairs, n_users, kept_users, err_bound) — counts and
    * the integer HT scale exact, the T4 bound over (users, kept users)
    * the shared [[graft.sampling.Stats.errBoundCol]] chain.
    */
  def pairsSampledU(events: DataFrame, pct: Int = 10): DataFrame = {
    import graft.sampling.{Stats, UniverseSampled}
    val kept = events.filter(UniverseSampled.keep(col("user_id"), pct))
    pairsBatchReplay(kept).agg(count(lit(1)).as("kept_pairs"))
      .crossJoin(broadcast(
        events.select("user_id").distinct().agg(count(lit(1)).as("n_users"))))
      .crossJoin(broadcast(
        kept.select("user_id").distinct().agg(count(lit(1)).as("kept_users"))))
      .select(
        col("kept_pairs"),
        (col("kept_pairs") * lit(UniverseSampled.scaleFor(pct))).as("est_pairs"),
        col("n_users"), col("kept_users"),
        Stats.errBoundCol(col("n_users"), col("kept_users"), 0.95).as("err_bound"))
  }

  def pairsSampledUOracleSql(pct: Int = 10): String = {
    import graft.sampling.{Stats, UniverseSampled}
    s"""WITH kept AS (
       |  SELECT * FROM events WHERE ${UniverseSampled.keepSql("user_id", pct)}
       |), ${pairsCte("kept")},
       |agg AS (SELECT CAST(count(*) AS BIGINT) AS kept_pairs FROM pairs),
       |u AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM events),
       |ku AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS kept_users FROM kept)
       |SELECT kept_pairs,
       |       kept_pairs * ${UniverseSampled.scaleFor(pct)} AS est_pairs,
       |       n_users, kept_users,
       |       ${Stats.errBoundSql("n_users", "kept_users", 0.95)} AS err_bound
       |FROM agg, u, ku""".stripMargin
  }

  /** Pair CTE shared by the oracle spellings; `from` lets the sampled
    * twin replay the identical chain over its kept slice (the curation
    * oracle-generator pattern).
    */
  private def pairsCte(from: String = "events"): String =
    s"""c AS (
       |  SELECT event_id AS click_id, user_id, epoch_us(ts) AS cts
       |  FROM $from WHERE event_type = 'click'
       |), p AS (
       |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
       |  FROM $from WHERE event_type = 'purchase'
       |), pairs AS (
       |  SELECT c.click_id, p.purchase_id, p.user_id, p.pts - c.cts AS gap_us
       |  FROM c JOIN p ON c.user_id = p.user_id
       |   AND p.pts > c.cts AND p.pts - c.cts <= CAST($WindowUs AS BIGINT)
       |)""".stripMargin

  def pairsOracleSql: String =
    s"""WITH ${pairsCte()}
       |SELECT click_id, purchase_id, user_id, gap_us FROM pairs
       |ORDER BY purchase_id, click_id""".stripMargin

  def organicOracleSql: String =
    s"""WITH c AS (
       |  SELECT user_id, epoch_us(ts) AS cts
       |  FROM events WHERE event_type = 'click'
       |), p AS (
       |  SELECT event_id AS purchase_id, user_id, epoch_us(ts) AS pts
       |  FROM events WHERE event_type = 'purchase'
       |)
       |SELECT purchase_id, user_id, pts AS purchase_us FROM p
       |WHERE NOT EXISTS (
       |  SELECT 1 FROM c WHERE c.user_id = p.user_id
       |   AND p.pts > c.cts AND p.pts - c.cts <= CAST($WindowUs AS BIGINT))
       |ORDER BY purchase_id""".stripMargin

  def lastTouchOracleSql: String =
    s"""WITH ${pairsCte()}
       |SELECT purchase_id, user_id, click_id, gap_us, n_clicks FROM (
       |  SELECT purchase_id, user_id, click_id, gap_us,
       |         count(*) OVER (PARTITION BY purchase_id) AS n_clicks,
       |         row_number() OVER (
       |           PARTITION BY purchase_id ORDER BY gap_us, click_id) AS rn
       |  FROM pairs
       |) WHERE rn = 1
       |ORDER BY purchase_id""".stripMargin
}
