package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables
import graft.text.Decontaminate

/** Stream-vs-batch bloom decontamination: streaming the corpus through the
  * stateless per-row bloom filter must keep exactly the batch bloom path's
  * clean set, across micro-batch boundaries.
  */
class StreamingDecontaminateSpec extends SparkSpec {
  import spark.implicits._

  test("streamed corpus keeps exactly the batch bloom-clean set") {
    val docs = Tables.documents(spark, sf001)
    val bits = Decontaminate.benchBloomBits(docs)
    val batchClean = Decontaminate.cleanBloom(docs)
      .collect().map(_.getLong(0)).toSet

    val corpus = docs.filter(col("doc_id") % Decontaminate.BenchEvery =!= 0)
      .select("doc_id", "text", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))

    val input = MemoryStream[(Long, String, Long)](spark)
    val out = StreamingDecontaminate.clean(
      input.toDF().toDF("doc_id", "text", "n_chars"), bits)
    val query = out.writeStream
      .format("memory").queryName("sdecon").outputMode("append").start()
    try {
      // two micro-batches — the filter must behave identically per batch
      val (b1, b2) = corpus.splitAt(corpus.length / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val got = spark.table("sdecon").collect().map(_.getLong(0)).toSet
      assert(got === batchClean,
        s"missing=${(batchClean -- got).take(5)} extra=${(got -- batchClean).take(5)}")
      assert(got.nonEmpty)
    } finally query.stop()
  }

  test("the per-row form equals the explode form on the batch frame") {
    val docs = Tables.documents(spark, sf001)
    val bits = Decontaminate.benchBloomBits(docs)
    val corpus = docs.filter(col("doc_id") % Decontaminate.BenchEvery =!= 0)
    val perRow = Decontaminate.cleanBloomPerRow(corpus, bits)
      .collect().map(_.getLong(0)).toSet
    val explodePath = Decontaminate.cleanBloom(docs)
      .collect().map(_.getLong(0)).toSet
    assert(perRow === explodePath)
  }

  test("a NULL-text doc survives the per-row form (the explode path keeps it)") {
    // the explode path produces no gram rows for a null text, so the doc is
    // never flagged and survives the anti-join; filter(NULL) in the per-row
    // form would silently drop it (review finding) — coalesce keeps it
    val docs = Tables.documents(spark, sf001)
    val bits = Decontaminate.benchBloomBits(docs)
    val withNull = spark.createDataFrame(Seq(
      (900001L, null.asInstanceOf[String], 0L),
      (900002L, "", 0L))).toDF("doc_id", "text", "n_chars")
    val kept = Decontaminate.cleanBloomPerRow(withNull, bits)
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(900001L, 900002L))
  }
}
