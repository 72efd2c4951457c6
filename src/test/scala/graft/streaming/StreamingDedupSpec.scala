package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.{DedupCorpus, MinHashLSH}
import graft.queries.Tables

/** Stream-vs-static-index near-dup: streaming half the corpus against the
  * full corpus's signature index must find exactly the batch pairs that
  * touch the streamed half.
  */
class StreamingDedupSpec extends SparkSpec {
  import spark.implicits._

  test("streamed docs find their batch near-dup pairs against the static index") {
    val corpus = DedupCorpus.augment(Tables.documents(spark, sf001))
    val indexSigs = MinHashLSH.signatures(corpus)

    // batch truth: uncapped pairs (the stream-static path carries no cap)
    val batchPairs = MinHashLSH
      .nearDupPairs(indexSigs, minSim = 0.5, maxBucket = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    spark.catalog.clearCache()

    // stream in every doc with an odd doc_id
    val half = corpus.filter(col("doc_id") % 2 === 1)
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val halfIds = half.map(_._1).toSet
    val expected = batchPairs.filter { case (a, b) => halfIds(a) || halfIds(b) }

    val input = MemoryStream[(Long, String)](spark)
    val out = StreamingDedup.nearDupsAgainstIndex(
      input.toDF().toDF("doc_id", "text"), indexSigs)
    val query = out.writeStream
      .format("memory").queryName("sdedup").outputMode("append").start()
    try {
      // two micro-batches — the join must work incrementally
      val (b1, b2) = half.splitAt(half.length / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val got = spark.table("sdedup").collect()
        .map { r =>
          val (a, b) = (r.getLong(0), r.getLong(1))
          (math.min(a, b), math.max(a, b)) // normalize orientation
        }
        .toSet // per-band duplicates collapse here
      assert(got === expected,
        s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
      assert(got.nonEmpty)
    } finally query.stop()
  }
}
