package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class BpeVocabSpec extends SparkSpec {

  /** Reference BPE: plain in-memory greedy merge over a word-count map —
    * the Sennrich algorithm with the same (count desc, byte-order asc)
    * tiebreak.
    */
  private def naiveBpe(
      wc: Map[String, Long],
      rounds: Int): (Seq[(String, String, Long)], Map[String, Seq[String]]) = {
    var dict: Map[String, (Long, Vector[String])] =
      wc.map { case (w, c) => w -> ((c, w.map(_.toString).toVector :+ BpeVocab.EndMark)) }
    var merges = Vector.empty[(String, String, Long)]
    for (_ <- 1 to rounds) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      dict.values.foreach { case (c, syms) =>
        syms.zip(syms.tail).foreach(p => counts(p) = counts.getOrElse(p, 0L) + c)
      }
      val ((l, r), c) = counts.toSeq.minBy { case ((l, r), c) => (-c, l, r) }
      merges :+= ((l, r, c))
      dict = dict.map { case (w, (cnt, syms)) =>
        val out = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += (l + r); i += 2 // greedy left-to-right, non-overlapping
          } else { out += syms(i); i += 1 }
        }
        w -> ((cnt, out.result()))
      }
    }
    (merges, dict.map { case (w, (_, syms)) => w -> syms })
  }

  test("merges match the naive in-memory BPE on the live corpus") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val wc = BpeVocab.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (expected, _) = naiveBpe(wc, BpeVocab.Rounds)
    val got = BpeVocab.merges(docs).collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(4)))
    assert(got.toSeq === expected)
  }

  test("token counts equal the naive segmentation weighted by word count") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val wc = BpeVocab.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (_, segs) = naiveBpe(wc, BpeVocab.Rounds)
    val expected = segs.toSeq
      .flatMap { case (w, syms) => syms.map(_ -> wc(w)) }
      .groupBy(_._1).map { case (t, g) => t -> g.map(_._2).sum }
    val got = BpeVocab.tokenCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === expected)
    // every word's last symbol carries the end mark, so end-marked token
    // mass must equal total word occurrences (conservation check)
    assert(
      got.filter(_._1.endsWith(BpeVocab.EndMark)).values.sum === wc.values.sum)
  }

  test("pair exhaustion stops learning and preserves the dict (no annihilation)") {
    import spark.implicits._
    // one single-char word: round 1 merges (a, $); round 2 has NO adjacent
    // pairs left — learning must stop with the dict intact, not crossJoin
    // it against an empty best frame into nothing
    val docs = Seq((1L, "a a a")).toDF("doc_id", "text")
    val (merges, dict) = BpeVocab.learn(docs)
    val learned = merges.filter(col("left_sym").isNotNull).collect()
    assert(learned.length < BpeVocab.Rounds, "expected early exhaustion")
    assert(learned.nonEmpty)
    val d = dict.collect()
    assert(d.length === 1, s"dict annihilated: ${d.toSeq}")
    val toks = BpeVocab.tokenCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(toks === Map("a" + BpeVocab.EndMark -> 3L))
  }

  test("greedy left-to-right merge on overlapping runs (a a a -> aa a)") {
    import spark.implicits._
    // word 'aaa' dominates so (a,a) merges first; greedy scan pairs the
    // FIRST two a's and must not re-merge across the replacement
    val docs = Seq((1L, "aaa aaa aaa ab")).toDF("doc_id", "text")
    val merges = BpeVocab.merges(docs).collect()
    assert((merges(0).getString(1), merges(0).getString(2)) === (("a", "a")))
    val toks = BpeVocab.tokenCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // after round 1: aaa -> [aa, a, $]; subsequent rounds may merge further,
    // but no token may ever be 'aaa'-without-end (would require overlap)
    assert(!toks.keys.exists(_ == "aaa"), s"overlapping merge produced aaa: $toks")
  }
}
