package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sampling.{MixtureResample, TokenBudget}
import graft.text.{SequencePacking, TrainingShard}

/** The physical end of the training-shard pipeline: materialize
  * [[graft.text.TrainingShard.manifest]] as partitioned parquet shards a
  * data loader can stream. The manifest names WHICH (doc, copy) goes in
  * which pack; this sink ships the bytes.
  *
  * Layout contract (what a loader relies on, all spec-pinned):
  *   - one `shard_id=N` parquet partition directory per
  *     [[graft.text.TrainingShard.PacksPerShard]]-pack slice of the
  *     layout;
  *   - within each shard's files, rows are sorted by (pack_id, cum) — the
  *     exact concat-and-chunk order the prefix sum assigned, so a
  *     sequential read reproduces the token stream without a sort on the
  *     loader side;
  *   - every replica row carries its full provenance (doc_id, copy, source,
  *     tok, cum, pack_id) next to the text, so any shard is independently
  *     auditable back to the manifest.
  *
  * Scale shape: the manifest is id-keyed and tiny next to the corpus; the
  * text joins back on doc_id (hash join; broadcast if the kept set is
  * small under AQE), then ONE hash exchange on shard_id and a
  * per-partition sort — the minimum any sorted-shard writer must pay.
  * `partitionBy` after `repartition(shard_id)` means each task writes
  * exactly one shard directory: no small-file explosion, no global sort.
  * Shard count — corpus tokens / (packTokens · packsPerShard) — sets the
  * write parallelism, which is exactly how a 100 TB run wants it (shards
  * ARE the unit of output parallelism); a skewed shard is impossible by
  * construction since shards are fixed-pack slices of the prefix sum.
  */
object ShardSink {

  /** Write the composed pipeline's output as sorted parquet shards.
    * Returns the shard summary (shard_id, n_packs, n_replicas, tokens) so
    * callers can log/verify what shipped without re-listing the sink.
    */
  def writeShards(
      docs: DataFrame,
      path: String,
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      packsPerShard: Long = TrainingShard.PacksPerShard,
      buckets: Int = TokenBudget.Buckets): DataFrame = {
    val manifest = TrainingShard.manifest(docs, weightsBp, packTokens, buckets)
      .withColumn("shard_id", expr(s"pack_id DIV $packsPerShard"))
    manifest
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .repartition(col("shard_id"))
      .sortWithinPartitions(col("shard_id"), col("pack_id"), col("cum"))
      .select(col("shard_id"), col("pack_id"), col("doc_id"), col("copy"),
        col("source"), col("tok"), col("cum"), col("text"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(path)
    TrainingShard.shardSummary(docs, weightsBp, packTokens, packsPerShard, buckets)
  }

  /** Read a shard sink back (partition column `shard_id` restored as a
    * long). Partition pruning applies: a loader asking for one shard scans
    * one directory.
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
      .withColumn("shard_id", col("shard_id").cast("long"))
}
