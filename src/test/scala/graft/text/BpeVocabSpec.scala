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

  test("saved-merges encode reproduces the learner's final segmentation, " +
    "and BPE budgets measurably differ from the whitespace proxy") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    // the APPLY path (saved artifact -> fold of replaces) must equal the
    // learner's final dict segmentation word for word — the invariant the
    // DuckDB oracle leans on (it replays the recurrence and reads w8)
    val path = BpeVocab.ensureSavedMerges(spark, sf001)
    assert(new java.io.File(s"$path/_SUCCESS").exists())
    assert(BpeVocab.ensureSavedMerges(spark, sf001) === path) // reused, not rebuilt
    val ms = BpeVocab.loadMerges(spark, path)
    assert(ms.size === BpeVocab.Rounds)
    val encoded = BpeVocab.wordTokens(docs, ms).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val wc = BpeVocab.wordCounts(docs).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val (_, segs) = naiveBpe(wc, BpeVocab.Rounds)
    assert(encoded === segs.map { case (w, syms) => w -> syms.size.toLong })
    // per-doc counts: the dict-join roll-up equals re-encoding each doc's
    // words directly, and wordless docs report 0 (spot-check by recompute)
    val perDoc = BpeVocab.perDocTokens(docs, ms).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val docWords = docs.select(col("doc_id"),
      graft.dedup.Hashing.words(col("text")).as("ws")).collect()
      .map(r => (r.getLong(0), r.getSeq[String](1).filter(_.nonEmpty)))
    docWords.foreach { case (id, ws) =>
      assert(perDoc(id) === ws.map(w => encoded(w)).sum, s"doc $id")
    }
    // the honest unit is MEASURABLY different from the proxy: with only 8
    // learned merges almost every word still splits near character level,
    // so corpus BPE mass must exceed whitespace mass, and no doc may
    // report fewer BPE tokens than words
    val proxy = docWords.map { case (id, ws) => id -> ws.size.toLong }.toMap
    assert(docWords.forall { case (id, _) => perDoc(id) >= proxy(id) })
    val (bpeTotal, wsTotal) = (perDoc.values.sum, proxy.values.sum)
    assert(bpeTotal > 2 * wsTotal,
      s"BPE mass $bpeTotal not measurably above whitespace mass $wsTotal")
    // and the budget twin therefore cuts at a different token line: same
    // kept ORDER (the hash is token-unit-independent), different cum unit
    val bpeSel = BpeVocab.tokenBudgetBpe(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val proxySel = graft.sampling.TokenBudget.select(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(bpeSel.nonEmpty && proxySel.nonEmpty)
    val shared = bpeSel.keySet intersect proxySel.keySet
    assert(shared.nonEmpty)
    assert(shared.forall(id => bpeSel(id) > proxySel(id) || proxySel(id) == 0L),
      "expected every shared worded doc to cost strictly more BPE tokens than proxy tokens")
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
