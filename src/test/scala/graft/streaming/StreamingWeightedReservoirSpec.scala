package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables
import graft.sampling.WeightedSampled

/** Streaming weighted reservoir vs the batch fixed-k selection: the A-ES
  * key is a pure per-row function, so the reservoir's final state must
  * equal the batch top-k BIT-FOR-BIT however the stream is chopped into
  * micro-batches.
  */
class StreamingWeightedReservoirSpec extends SparkSpec {
  import spark.implicits._

  private val K = StreamingWeightedReservoir.ReservoirK

  /** Drain an update-mode reservoir stream through `foreachBatch`, tagging
    * every emission with its micro-batch id, and return the MAX-BATCH
    * emission per shard. The earlier memory-sink spelling reconstructed
    * "last emission" from sink arrival order, which is an implementation
    * detail across batches (ADVICE r15) — the batch id is the contract.
    */
  private def lastReservoirPerShard(
      out: org.apache.spark.sql.Dataset[(Int, Seq[(Long, Long, Long)])],
      input: MemoryStream[(Long, String, Long)],
      batches: Seq[Seq[(Long, String, Long)]],
      name: String): Seq[Seq[(Long, Long, Long)]] = {
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Int, Seq[(Long, Long, Long)])]
    val query = out.writeStream
      .queryName(name).outputMode("update")
      .foreachBatch {
        (ds: org.apache.spark.sql.Dataset[(Int, Seq[(Long, Long, Long)])],
         batchId: Long) =>
          val rows = ds.collect().map { case (shard, res) =>
            (batchId, shard, res)
          }
          emitted.synchronized { emitted ++= rows }
          ()
      }
      .start()
    try {
      batches.foreach { b =>
        input.addData(b.toIndexedSeq: _*)
        query.processAllAvailable()
      }
    } finally query.stop()
    emitted.synchronized {
      emitted.groupBy(_._2).values.map(_.maxBy(_._1)._3).toSeq
    }
  }

  test("final reservoir equals the batch fixed-k sample across micro-batches") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val expected = WeightedSampled.sampleK(docs, K)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1).toSeq

    val rows = docs.select("doc_id", "source", "n_chars")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val input = MemoryStream[(Long, String, Long)](spark)
    val out = StreamingWeightedReservoir.reservoirs(
      spark, input.toDF().toDF("doc_id", "source", "n_chars"), K)
    // three unequal micro-batches — the reservoir must merge, not rescan
    val (b1, rest) = rows.splitAt(rows.length / 5)
    val (b2, b3) = rest.splitAt(rest.length / 2)
    val lastPerShard =
      lastReservoirPerShard(out, input, Seq(b1, b2, b3), "wres")
    // per-shard state never exceeds k
    lastPerShard.foreach(s => assert(s.length <= K))
    val got = StreamingWeightedReservoir
      .selectTopK(lastPerShard, K)
      .map { case (akey, id, w) => (id, w, akey) }
      .sortBy(_._1)
    assert(got === expected)
  }

  test("replay query equals the plain fixed-k selection (the oracle identity)") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val replay = StreamingWeightedReservoir.replay(docs, K)
      .collect().map(_.toString).sorted.toSeq
    val plain = WeightedSampled.sampleK(docs, K)
      .collect().map(_.toString).sorted.toSeq
    assert(replay === plain)
  }

  test("a late high-key arrival displaces the current minimum (reservoir property)") {
    // review r15: a single late doc was VACUOUS — its deterministic key
    // ranked 7th of 61, so the test passed even if the second batch was
    // dropped. Forty w=8 late docs vs sixty w=1 early docs make top-4
    // membership of late keys a property of the fixture, asserted below —
    // deterministic keys, so no flakiness once green.
    val early = (1L to 60L).map(i => (i, "s", 50L)) // w=1 each
    val late = (1000L to 1039L).map(i => (i, "s", 5000L)) // w=8 each
    val input = MemoryStream[(Long, String, Long)](spark)
    val out = StreamingWeightedReservoir.reservoirs(
      spark, input.toDF().toDF("doc_id", "source", "n_chars"), 4)
    val lastPerShard =
      lastReservoirPerShard(out, input, Seq(early, late), "wres_late")
    val sel = StreamingWeightedReservoir.selectTopK(lastPerShard, 4)
    val expected = WeightedSampled
      .sampleK((early ++ late).toDF("doc_id", "source", "n_chars"), 4)
      .collect().map(r => (r.getLong(2), r.getLong(0), r.getLong(1))).toSet
    // the displacement property is only exercised if a LATE doc made the
    // cut — assert it did, so a state-merge regression cannot pass
    // against a batch-1-only expected set
    assert(expected.exists { case (_, id, _) => id >= 1000L },
      "fixture defect: no late doc in the batch top-4 — displacement untested")
    assert(sel.toSet === expected)
  }
}
