package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout}

import graft.sampling.WeightedSampled

/** Streaming weighted reservoir: maintain the k best-keyed documents seen
  * so far, weighted without replacement — the ingest-time form of
  * [[graft.sampling.WeightedSampled]]. This is the shape Efraimidis &
  * Spirakis actually published (a reservoir algorithm): because the A-ES
  * rank key is a pure per-row function, "the weighted sample of the
  * stream so far" is just "the k largest keys so far", and a later row
  * displaces the current minimum exactly like the one-pass reservoir.
  *
  * Note the contract difference from the batch operator: the batch cutoff
  * k = n/10 derives from the live corpus count, which a stream never has
  * — a reservoir's k is FIXED up front. The declared replay query and the
  * spec therefore run the fixed-k form ([[WeightedSampled.sampleK]]).
  *
  * State discipline: rows hash into [[Buckets]] reservoir shards
  * (`mapGroupsWithState` keyed by the low bits of the rank key — md5
  * bits, uniform regardless of weight skew), each holding a ≤ k-entry
  * sorted buffer: state is Buckets·k fixed-width entries TOTAL, bounded
  * by configuration, not by stream length. The final selection is the
  * global top-k of the shard buffers — a Buckets·k-row (metadata) merge.
  * Per-trigger cost is one merge-and-trim per shard; nothing ever
  * rescans earlier input.
  */
object StreamingWeightedReservoir {

  /** Reservoir shard count: state = Buckets·k entries, and the per-shard
    * buffer merge parallelizes across shards. At cluster scale raise it
    * toward the executor-slot count; the final merge stays metadata-sized.
    */
  val Buckets = 32

  /** Fixed reservoir size of the declared replay query (the batch
    * operator's n/10 at the sf0.001 fixture, so the two contracts are
    * comparable side by side).
    */
  val ReservoirK = 50

  /** (bucket, akey, doc_id, w) ingest projection — the SAME key math as
    * the batch sampler ([[WeightedSampled.keyed]]), so stream and batch
    * selections agree bit-for-bit. The shard id reuses the rank key's low
    * bits: md5 bits are uniform, so no weight-skewed shard fills faster.
    */
  private def ingest(docs: DataFrame): DataFrame =
    WeightedSampled.keyed(docs)
      .select(
        (col("akey") % Buckets).cast("int").as("bucket"),
        col("akey"), col("doc_id"), col("w"))

  /** The streaming reservoir: per shard, the current ≤ k best entries,
    * re-emitted on every trigger (Update mode). The union of the LAST
    * emission per shard is the reservoir; [[selectTopK]] cuts it to k.
    */
  def reservoirs(
      spark: SparkSession,
      docs: DataFrame,
      k: Int): Dataset[(Int, Seq[(Long, Long, Long)])] = {
    import spark.implicits._
    ingest(docs).as[(Int, Long, Long, Long)]
      .groupByKey(_._1)
      .mapGroupsWithState[Seq[(Long, Long, Long)], (Int, Seq[(Long, Long, Long)])](
        GroupStateTimeout.NoTimeout) { (bucket, rows, state) =>
        val fresh = rows.map { case (_, akey, id, w) => (akey, id, w) }
        val merged = (state.getOption.getOrElse(Nil) ++ fresh)
          .sortBy { case (akey, id, _) => (-akey, id) }
          .take(k)
        state.update(merged)
        (bucket, merged)
      }
  }

  /** Driver-side final cut for the spec/consumer: global top-k of the
    * shard buffers (≤ Buckets·k entries — metadata).
    */
  def selectTopK(
      shards: Seq[Seq[(Long, Long, Long)]], k: Int): Seq[(Long, Long, Long)] =
    shards.flatten.sortBy { case (akey, id, _) => (-akey, id) }.take(k)

  /** Batch replay of the ingest math, oracle-gated: per-shard top-k (a
    * shard-partitioned window — parallel, never global over data), then
    * the global top-k over the ≤ [[Buckets]]·k survivors. The final
    * window IS partition-less but bounded by Buckets·k rows of
    * configuration-sized metadata (the documented bucket-offset-class
    * argument; tripwire-whitelisted). Equals the plain fixed-k A-ES
    * selection: the global top-k survives every per-shard cut.
    */
  def replay(docs: DataFrame, k: Int = ReservoirK): DataFrame = {
    val perShard = Window.partitionBy("bucket")
      .orderBy(col("akey").desc, col("doc_id").asc)
    val survivors = ingest(docs)
      .withColumn("rn", row_number().over(perShard))
      .filter(col("rn") <= k)
    survivors
      .withColumn("grn",
        row_number().over(Window.orderBy(col("akey").desc, col("doc_id").asc)))
      .filter(col("grn") <= k)
      .select(col("doc_id"), col("w"), col("akey"))
  }
}
