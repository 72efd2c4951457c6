package graft.text

import graft.SparkSpec
import graft.queries.Tables

class ChunkerSpec extends SparkSpec {

  test("chunks reconstruct every document under stride/overlap invariants") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val words = docs.select(
      org.apache.spark.sql.functions.col("doc_id"),
      org.apache.spark.sql.functions.array_remove(
        graft.dedup.Hashing.words(org.apache.spark.sql.functions.col("text")), ""))
      .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
    val chunks = Chunker.chunks(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4)))
      .groupBy(_._1)
    // docs with tokens are chunked; empty docs absent
    assert(chunks.keySet === words.filter(_._2.nonEmpty).keys.toSet)
    chunks.foreach { case (id, cs) =>
      val w = words(id)
      val sorted = cs.sortBy(_._2)
      // chunk ids are 0..nc-1; starts advance by Stride
      assert(sorted.map(_._2).toSeq === sorted.indices.map(_.toLong))
      sorted.foreach { case (_, cid, start, nTok, text) =>
        assert(start === cid * Chunker.Stride)
        val expect = w.slice(start.toInt, start.toInt + Chunker.ChunkTokens)
        assert(nTok === math.min(Chunker.ChunkTokens.toLong, w.length - start))
        assert(text === expect.mkString(" "), s"doc $id chunk $cid")
      }
      // coverage: the last chunk reaches the doc end
      val last = sorted.last
      assert(last._3 + last._4 === w.length.toLong)
      // every token index is inside some chunk
      if (w.length > Chunker.ChunkTokens)
        assert(sorted.size === 1 + (w.length - Chunker.ChunkTokens + Chunker.Stride - 1) / Chunker.Stride)
      else assert(sorted.size === 1)
    }
  }

  test("plan has no keyed shuffle (only the round-robin parallelism floor)") {
    assumeTestdata(sf001)
    val plan = Chunker.chunks(Tables.documents(spark, sf001))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("hashpartitioning") && !plan.contains("rangepartitioning"),
      s"unexpected keyed shuffle in:\n$plan")
  }
}
