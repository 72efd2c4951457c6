package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Hashing
import graft.queries.Tables

/** [[TokenBudget]] against a brute-force single-machine prefix sum: the
  * two-level (bucketed) distributed prefix sum must select EXACTLY the
  * maximal hash-ordered prefix fitting the budget.
  */
class TokenBudgetSpec extends SparkSpec {

  test("HT scale: integer-exact only for pct dividing RangeMod, loud otherwise") {
    // RangeMod/pct with unchecked integer division silently floors the
    // scale (pct=3 -> x33 instead of x33.33, a ~1% systematic
    // underestimate) and divides by zero at pct=0 — every estimator path
    // goes through the checked helper instead
    assert(UniverseSampled.scaleFor(10) === 10L)
    assert(UniverseSampled.scaleFor(25) === 4L)
    assert(UniverseSampled.scaleFor(100) === 1L)
    Seq(0, 3, 8, 101, -5).foreach { bad =>
      intercept[IllegalArgumentException](UniverseSampled.scaleFor(bad))
    }
  }

  test("selection is the maximal hash-ordered prefix within budget") {
    val base = Tables.documents(spark, sf001)
      .select(
        col("doc_id"),
        Hashing.hash60(concat(lit("tb:"), col("doc_id").cast("string"))).as("h"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val total = base.map(_._3).sum
    val budget = total * 2 / 5
    // global hash order — the ORDER the buckets+offsets machinery must
    // reproduce exactly. Bucketing by h % 64 then offsetting by bucket is
    // order-equivalent ONLY in the aggregate sense: the within-prefix SET
    // is what must match, and each row's cum must equal its global rank sum
    // in (h % 64, then h) order. Recompute that order directly:
    val ordered = base.sortBy(t => (t._2 % TokenBudget.Buckets, t._2, t._1))
    val cums = ordered.scanLeft(0L)(_ + _._3).tail
    val expected = ordered.zip(cums).filter(_._2 <= budget)
      .map { case ((id, _, tok), cum) => (id, tok, cum) }
      .sortBy(_._1)
    val got = TokenBudget.select(Tables.documents(spark, sf001))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected.toSeq)
    // budget actually binds and is respected to the last token
    assert(expected.nonEmpty && expected.size < base.length)
    assert(got.map(_._2).sum <= budget)
    // maximality: the first excluded row in order would overflow the budget
    val firstExcluded = ordered.zip(cums).find(_._2 > budget)
    assert(firstExcluded.nonEmpty)
  }
}
