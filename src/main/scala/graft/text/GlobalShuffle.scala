package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Deterministic global training-order shuffle: assign every document a
  * pseudo-random GLOBAL position (a permutation of 1..N) and a shard id,
  * the step that turns a curated corpus into the randomized, shardable
  * stream a training run consumes. Orderings must be reproducible run-over-
  * run (resume-from-step, ablation A/Bs), so the "randomness" is the
  * seeded md5 key family, not an RNG.
  *
  * Scale design (100 TB): a global `row_number() OVER (ORDER BY h)` is a
  * single-task sort — unusable. Instead: `repartitionByRange` on the hash
  * key gives non-overlapping sorted ranges (Spark's TotalOrderPartitioner
  * analog); per-partition ordinals come from a window PARTITIONED by the
  * range partition, and global offsets from the per-partition row counts —
  * a `numShufflePartitions`-row aggregate, broadcast back. One wide shuffle
  * total, every stage data-parallel; this is the exchange-reuse sibling of
  * [[graft.sampling.TokenBudget]]'s bucketed prefix sum (which orders by
  * (bucket, h) — here the layout is the RANGE partitioner, so the output
  * order is globally h-ascending and the oracle is a plain window).
  *
  * The range shuffle is `localCheckpoint`ed before fan-out: boundaries are
  * SAMPLED (nondeterministic across evaluations), so the count pass and
  * the ordinal pass MUST observe the same materialized boundaries — the
  * checkpoint is a correctness requirement here, not a perf knob. Ranks
  * are still deterministic end-to-end because offsets are computed from
  * whatever boundaries materialized.
  */
object GlobalShuffle {

  /** Seed prefix of the position-hash family — bump to reshuffle. */
  val Seed = "gs42"

  /** Documents per training shard. */
  val ShardSize = 64L

  /** The checkpointed range-shuffle stage (exposed for the spec's range-
    * invariant pin): (doc_id, h, pid) with non-overlapping h-ranges per
    * ascending pid.
    */
  private[graft] def ranged(docs: DataFrame): DataFrame = {
    val parts = docs.sparkSession.sessionState.conf.numShufflePartitions
    docs.select(
      col("doc_id"),
      Hashing.hash60(concat(lit(s"$Seed:"), col("doc_id").cast("string"))).as("h"))
      .repartitionByRange(parts, col("h"), col("doc_id"))
      .withColumn("pid", spark_partition_id())
      .localCheckpoint(false)
  }

  /** (doc_id, pos, shard): pos is the 1-based global position of doc_id in
    * ascending (position-hash, doc_id) order; shard =
    * (pos−1) div `shardSize`.
    */
  def positions(docs: DataFrame, shardSize: Long = ShardSize): DataFrame = {
    val r = ranged(docs)
    // parts-row metadata aggregate → exclusive prefix offsets (the same
    // "unpartitioned window over partition COUNTS, never over data" shape
    // TokenBudget documents)
    val offsets = r.groupBy("pid").agg(count(lit(1)).as("n"))
      // the RangeRank.withPos guard (this is the code that mechanism was
      // generalized from): row_number() is 32-bit, so a range partition
      // past 2^31-1 rows would wrap rn silently and corrupt shard
      // assignment — fail loudly from the already-computed counts
      .withColumn("n",
        when(col("n") > Int.MaxValue.toLong,
          raise_error(lit(
            s"GlobalShuffle.positions: a range partition exceeds ${Int.MaxValue} " +
              "rows (row_number would wrap); raise spark.sql.shuffle.partitions")))
          .otherwise(col("n")))
      .withColumn("off",
        coalesce(
          sum(col("n")).over(
            Window.orderBy("pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("pid", "off")
    val inPart = Window.partitionBy("pid").orderBy("h", "doc_id")
    r
      .withColumn("rn", row_number().over(inPart))
      .join(broadcast(offsets), "pid")
      .select(
        col("doc_id"),
        (col("off") + col("rn")).as("pos"),
        expr(s"(off + rn - 1) div $shardSize").as("shard"))
  }

  /** Per-shard manifest: row count and the doc_id span of each shard — the
    * sink-side summary a shard writer emits (and the frame a resume-from-
    * shard-k reader plans against).
    */
  def shardManifest(docs: DataFrame, shardSize: Long = ShardSize): DataFrame =
    positions(docs, shardSize)
      .groupBy("shard")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col("doc_id")).as("min_doc"),
        max(col("doc_id")).as("max_doc"))

  // positions-only CTE — shard arithmetic stays at the call sites
  private def posCteSql: String =
    s"""k AS (SELECT doc_id,
       |        ${Hashing.hash60Sql(s"'$Seed:' || CAST(doc_id AS VARCHAR)")} AS h
       |      FROM documents),
       |p AS (SELECT doc_id,
       |        CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
       |      FROM k)""".stripMargin

  /** DuckDB oracle for [[positions]]: at oracle scale the global window IS
    * affordable, and h-ascending row_number equals the two-level rank by
    * construction (ranges are non-overlapping and pid-ordered).
    */
  def positionsOracleSql(shardSize: Long = ShardSize): String =
    s"""WITH $posCteSql
       |SELECT doc_id, pos, (pos - 1) // $shardSize AS shard
       |FROM p ORDER BY doc_id""".stripMargin

  def shardManifestOracleSql(shardSize: Long = ShardSize): String =
    s"""WITH $posCteSql
       |SELECT (pos - 1) // $shardSize AS shard, count(*) AS n_docs,
       |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
       |FROM p GROUP BY 1 ORDER BY 1""".stripMargin
}
