package graft.text

import graft.SparkSpec
import graft.queries.Tables

class QualityDecilesSpec extends SparkSpec {

  test("profile matches the naive per-source decile computation") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val scored = TextAnalysis.qualityScore(docs)
      .select("doc_id", "n_chars", "quality")
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
      .collect()
      .map(r => (r.getString(3), r.getLong(0), r.getLong(1), r.getDouble(2)))
    val expected = scored.groupBy(_._1).flatMap { case (src, rows) =>
      val ordered = rows.sortBy(t => (t._4, t._2))
      val n = ordered.length.toLong
      ordered.zipWithIndex
        .map { case ((_, _, chars, q), i) => (i.toLong * QualityDeciles.Buckets / n + 1, chars, q) }
        .groupBy(_._1)
        .map { case (d, g) =>
          (src, d) -> ((g.length.toLong, g.map(_._2).sum, g.map(_._3).min, g.map(_._3).max))
        }
    }
    val got = QualityDeciles.profile(docs).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5))))
      .toMap
    assert(got.size === expected.size)
    expected.foreach { case (k, v) => assert(got(k) === v, s"decile $k") }
    // all sources covered, deciles within 1..10
    assert(got.keys.map(_._2).forall(d => d >= 1 && d <= 10))
  }
}
