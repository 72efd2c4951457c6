package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables
import graft.text.TrainingShard

/** The shard sink's layout contract: partitioned directories, in-file
  * (pack_id, cum) order, manifest-faithful content, and prunable reads.
  */
class ShardSinkSpec extends SparkSpec {

  private val path = s"${System.getProperty("java.io.tmpdir")}/graft_shard_sink"

  test("writeShards ships every manifest replica into its shard, sorted by (pack_id, cum)") {
    val docs = Tables.documents(spark, sf001)
    val summary = ShardSink.writeShards(docs, path).collect()
    assert(summary.length > 1, "fixture must produce several shards, not one")

    val manifest = TrainingShard.manifest(docs)
      .withColumn("shard_id", expr(s"pack_id DIV ${TrainingShard.PacksPerShard}"))
    val back = ShardSink.read(spark, path)

    // content: the sink holds exactly the manifest's (replica → shard) rows
    val expected = manifest
      .select("shard_id", "pack_id", "doc_id", "copy", "source", "tok", "cum")
    assert(back.select("shard_id", "pack_id", "doc_id", "copy", "source", "tok", "cum")
      .exceptAll(expected).isEmpty, "sink rows not in manifest")
    assert(expected.exceptAll(
      back.select("shard_id", "pack_id", "doc_id", "copy", "source", "tok", "cum"))
      .isEmpty, "manifest rows missing from sink")

    // every row carries its text, matching the corpus
    assert(back.join(docs.select(col("doc_id"), col("text").as("t")), "doc_id")
      .filter(col("text") =!= col("t")).isEmpty)

    // shards are contiguous fixed-pack slices
    assert(back.filter(
      col("pack_id") < col("shard_id") * TrainingShard.PacksPerShard ||
        col("pack_id") >= (col("shard_id") + 1) * TrainingShard.PacksPerShard).isEmpty)

    // in-file order: within every parquet part file, rows appear sorted by
    // (pack_id, cum) — the loader-side no-sort guarantee
    val shardDirs = new java.io.File(path).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("shard_id="))
    assert(shardDirs.nonEmpty)
    shardDirs.foreach { d =>
      d.listFiles().filter(f => f.getName.endsWith(".parquet")).foreach { f =>
        val rows = spark.read.parquet(f.getPath)
          .select("pack_id", "cum").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(rows.sameElements(rows.sortBy(identity)),
          s"rows in ${f.getName} not (pack_id, cum)-sorted")
      }
    }
  }

  test("a single-shard read prunes to one partition directory") {
    val q = ShardSink.read(spark, path).filter(col("shard_id") === 0L)
    q.collect()
    val scanLine = q.queryExecution.executedPlan.toString
      .linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("shard_id"), scanLine)
  }

  test("summary returned by the writer matches the oracle roll-up of the manifest") {
    val docs = Tables.documents(spark, sf001)
    val summary = TrainingShard.shardSummary(docs).orderBy("shard_id").collect()
    val manual = TrainingShard.manifest(docs)
      .withColumn("shard_id", expr(s"pack_id DIV ${TrainingShard.PacksPerShard}"))
      .groupBy("shard_id")
      .agg(countDistinct(col("pack_id")).as("n_packs"),
        count(lit(1)).as("n_replicas"), sum(col("tok")).as("tokens"))
      .orderBy("shard_id").collect()
    assert(summary.sameElements(manual))
    // all packs except possibly the last shard's are full slices
    summary.dropRight(1).foreach { r =>
      assert(r.getLong(1) === TrainingShard.PacksPerShard, r.toString)
    }
  }
}
