package graft.sampling

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Post-run sampling report — same fields and formatting as the reference's
  * ZooKeeper/stdout report (RandomSamplingUtil.java:306-328), including the
  * exact field labels its comparator machine-parses
  * (RSMRResultComparator.java:100-102 parses "[Designed sample rate]").
  */
final case class SamplingReport(
    jobId: Int,
    total: Long,
    sampled: Long,
    designedRate: Double,
    confidence: Double,
    timeCostSec: Double) {

  def actualRate: Double = if (total == 0) 0.0 else sampled.toDouble / total

  /** Achieved error bound (T4, finite-population corrected). */
  def errorRate: Double = Stats.errorBound(confidence, total, sampled)

  override def toString: String =
    s"[Job ID] $jobId\n" +
      s"[Total record] $total\n" +
      s"[Sampled record] $sampled\n" +
      f"[Designed sample rate] ${designedRate * 100}%.2f%%\n" +
      f"[Actual sample rate] ${actualRate * 100}%.2f%%\n" +
      s"[Confidence level] $confidence\n" +
      f"[Error rate] ${errorRate * 100}%.2f%%\n" +
      f"[Time cost] $timeCostSec%.2fs"
}

/** Seeded Bernoulli sample over a DataFrame, with exact record accounting and
  * Horvitz–Thompson scale-up — the Spark-native replacement for the
  * reference's sampled RecordReaders + ZooKeeper counter tree
  * (RandomizedLineRecordReader.java:67-94, RandomSamplingUtil.java:264-328).
  *
  * Design notes for scale (100 TB / 1000 executors):
  *  - The keep/drop decision is `rand(seed) < p` — a codegen'd Catalyst
  *    expression evaluated inside the scan stage, so rejected rows never
  *    leave the scan's whole-stage-codegen loop (the moral equivalent of the
  *    reference's read-and-discard loop, RandomizedLineRecordReader.java:67-81).
  *    Catalyst pushes column pruning below it, so a sampled count scans zero
  *    parquet columns.
  *  - `totalCount` on a bare parquet scan is answered from file-footer row
  *    counts (no data read) — this replaces the reference's per-reader total
  *    counters with something that is free even at 100 TB.
  *  - Accounting deliberately does NOT use accumulators inside the data path:
  *    task retries and speculative execution double-count accumulator updates
  *    inside transformations; separate deterministic counting jobs cannot
  *    (SURVEY.md §7.5).
  *  - `rand(seed)` is deterministic per (seed, partition index, row position),
  *    so the sampled row-set is reproducible run-to-run — an intentional fix
  *    of the reference's unseeded Random.
  */
final class Sampled private (
    val source: DataFrame,
    val config: SamplingConfig,
    val jobId: Int,
    startNanos: Long) {

  /** Effective designed probability after T5 resolution. */
  val ratio: Double = config.resolvedRatio

  /** The sampled relation. Ratio 1.0 degenerates to the identity (no filter
    * node at all, so exact mode pays zero overhead).
    */
  val data: DataFrame =
    if (ratio >= 1.0) source
    else source.filter(rand(config.seed) < lit(ratio))

  /** Exact input cardinality. Metadata-only for bare parquet scans. */
  lazy val totalCount: Long = source.count()

  /** Exact sampled cardinality (one zero-column pass evaluating the filter). */
  lazy val sampledCount: Long = data.count()

  /** Actual achieved sampling rate (what the reference computed from its
    * per-reader ZooKeeper counters, RandomSamplingUtil.java:306-315).
    */
  def actualRatio: Double = if (totalCount == 0) 0.0 else sampledCount.toDouble / totalCount

  /** Horvitz–Thompson scale-up of an additive aggregate (count/sum) computed
    * on the sampled data: estimate = aggregate / ratio. This is the estimator
    * the reference's comparator applies when judging sampled output
    * (RSMRResultComparator.java:58-71, T7).
    *
    * Uses the designed ratio by default (the reference's choice); pass
    * `actual = true` to scale by the achieved rate instead (lower variance,
    * costs the two counting jobs).
    */
  def htScale(aggregate: Column, actual: Boolean = false): Column =
    aggregate / lit(if (actual) actualRatio else ratio)

  /** Post-run report (T6). Triggers the two counting jobs. */
  def report(): SamplingReport = SamplingReport(
    jobId = jobId,
    total = totalCount,
    sampled = sampledCount,
    designedRate = ratio,
    confidence = config.confidence,
    timeCostSec = (System.nanoTime() - startNanos) / 1e9)
}

object Sampled {
  // Driver-local monotone job counter — replaces the reference's ZooKeeper
  // `{root}/jobs` znode (RandomSamplingUtil.java:270-276) and is atomic,
  // unlike its read-increment-write.
  private val jobIds = new AtomicInteger(0)

  def apply(source: DataFrame, config: SamplingConfig): Sampled =
    new Sampled(source, config, jobIds.incrementAndGet(), System.nanoTime())

  def apply(source: DataFrame, ratio: Double, seed: Long = SamplingConfig.DefaultSeed): Sampled =
    apply(source, SamplingConfig(ratio = ratio, seed = seed))
}
