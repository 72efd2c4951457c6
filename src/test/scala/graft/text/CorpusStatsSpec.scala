package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** [[CorpusStats]]: collocation lift and Simpson diversity vs brute-force
  * recomputation, plus the no-global-sort rank shape.
  */
class CorpusStatsSpec extends SparkSpec {

  private def docsOf = Tables.documents(spark, sf001)

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+", -1).toSeq

  test("collocations equal a brute-force bigram/unigram lift ranking") {
    val texts = docsOf.select("text").collect().map(_.getString(0))
    val uni = scala.collection.mutable.Map.empty[String, Long]
    val bi = scala.collection.mutable.Map.empty[(String, String), Long]
    texts.foreach { t =>
      val w = tokens(t)
      w.filter(_.nonEmpty).foreach(x => uni(x) = uni.getOrElse(x, 0L) + 1)
      w.sliding(2).foreach {
        case Seq(a, b) if a.nonEmpty && b.nonEmpty =>
          bi((a, b)) = bi.getOrElse((a, b), 0L) + 1
        case _ =>
      }
    }
    val expected = bi.toSeq
      .map { case ((a, b), cxy) => (a, b, cxy, cxy * 1000000L / (uni(a) * uni(b))) }
      .sortBy { case (a, b, _, l) => (-l, a, b) }
      .take(CorpusStats.TopK)
    val q = CorpusStats.collocations(docsOf)
    val got = q.collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected)
    assert(q.queryExecution.executedPlan.toString.contains("TakeOrderedAndProject"))
  }

  test("snapshot drift report balances per source") {
    val rows = CorpusStats.snapshotDrift(docsOf).orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    assert(rows.nonEmpty)
    rows.foreach { case (src, before, after, added, addedChars, removed) =>
      assert(after == before + added - removed, s"unbalanced drift for $src")
      assert(removed == 0L, "append-only fixture reported removals")
      assert(addedChars >= 0L)
    }
    // brute force one source end-to-end
    val docs = docsOf.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val src = rows.head._1
    val ofSrc = docs.filter(_._2 == src)
    assert(rows.head._2 == ofSrc.count(_._1 % graft.text.InvertedIndex.DeltaMod != 0))
    assert(rows.head._3 == ofSrc.length)
  }

  test("per-source diversity equals brute-force Simpson in ppm") {
    val rows = docsOf.select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val expected = rows.groupBy(_._1).map { case (src, ds) =>
      val counts = ds.flatMap(d => tokens(d._2).filter(_.nonEmpty))
        .groupBy(identity).map(_._2.size.toLong)
      val t = counts.sum
      val s2 = counts.map(c => BigInt(c) * BigInt(c)).sum
      val ppm = ((BigInt(t) * BigInt(t) - s2) * 1000000 / (BigInt(t) * BigInt(t))).toLong
      src -> (t, counts.size.toLong, ppm)
    }
    val got = CorpusStats.diversityBySource(docsOf).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got == expected)
    // a uniform-ish synthetic vocabulary is highly diverse but not total
    got.values.foreach { case (_, _, ppm) => assert(ppm > 0 && ppm < 1000000) }
  }
}
