package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Hashing
import graft.queries.Tables
import graft.sampling.TokenBudget

/** [[SequencePacking]]: the distributed concat-and-chunk assignment must
  * equal a single-machine recomputation, and pack token totals must hug
  * the budget (each pack starts within one document of its boundary).
  */
class SequencePackingSpec extends SparkSpec {

  test("pack assignment equals brute force; pack sizes hug the budget") {
    val base = Tables.documents(spark, sf001)
      .select(
        col("doc_id"),
        Hashing.hash60(concat(lit("tb:"), col("doc_id").cast("string"))).as("h"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ordered = base.sortBy(t => (t._2 % TokenBudget.Buckets, t._2, t._1))
    val cums = ordered.scanLeft(0L)(_ + _._3).tail
    val L = SequencePacking.PackTokens
    val expected = ordered.zip(cums)
      .map { case ((id, _, tok), cum) => (id, tok, cum, (cum - tok) / L) }
      .sortBy(_._1)
    val got = SequencePacking.packs(Tables.documents(spark, sf001))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    // budget discipline: every pack's token total stays under L plus its
    // final (boundary-straddling) document, and all but the last pack
    // reach at least L tokens counting that straddler
    val byPack = expected.groupBy(_._4).toSeq.sortBy(_._1)
    assert(byPack.size > 1, "fixture produced a single pack — budget too big")
    val maxDoc = base.map(_._3).max
    byPack.init.foreach { case (p, ds) =>
      val total = ds.map(_._2).sum
      assert(total <= L + maxDoc, s"pack $p overflows: $total")
      assert(total >= L - maxDoc, s"pack $p underfills: $total")
    }
  }
}
