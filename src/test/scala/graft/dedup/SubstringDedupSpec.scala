package graft.dedup

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.GramHashes
import graft.queries.Tables

class SubstringDedupSpec extends SparkSpec {
  import spark.implicits._

  private val K = SubstringDedup.GramLen

  /** Deterministic filler with (overwhelmingly) no repeated K-gram across
    * calls — distinct seeds give distinct 26^40 windows.
    */
  private def filler(seed: Int, len: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until len).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  /** Independent direct-sum reference for the rolling kernel: the
    * polynomial over code points, one mod after per-term mods.
    */
  private def directHashes(s: String): Seq[Long] = {
    val codes = s.codePoints().toArray.map(_.toLong)
    val n = codes.length - K + 1
    (0 until math.max(n, 0)).map { p =>
      var acc = 0L
      for (j <- 0 until K)
        acc += codes(p + j) * GramHashes.PolyPow(K - 1 - j) % GramHashes.PolyMod
      acc % GramHashes.PolyMod
    }
  }

  test("rolling kernel equals the direct polynomial (ASCII + multibyte + short)") {
    val cases = Seq(
      filler(1, 200),
      "héllo wörld ünïcode — " + filler(2, 80) + " 漢字テスト" + filler(3, 60),
      filler(4, K), // exactly one gram
      filler(5, K - 1), // too short: empty
      "")
    cases.foreach { s =>
      val got = GramHashes.compute(UTF8String.fromString(s)).toLongArray().toSeq
      assert(got === directHashes(s), s"mismatch on ${s.take(30)}…")
      got.foreach(h => assert(h >= 0 && h < GramHashes.PolyMod))
    }
  }

  test("gram count tracks Spark's numChars on malformed UTF-8 tails " +
    "(span positions index the same characters substring() does)") {
    val clean = filler(50, 60).getBytes("UTF-8")
    Seq(
      clean :+ 0xE4.toByte :+ 0xB8.toByte, // truncated 3-byte tail
      clean :+ 0xF0.toByte :+ 0x9F.toByte, // truncated 4-byte tail
      clean :+ 0x80.toByte // stray continuation
    ).foreach { bytes =>
      val s = UTF8String.fromBytes(bytes)
      assert(GramHashes.compute(s).numElements() === s.numChars - K + 1,
        s"numChars=${s.numChars}")
    }
  }

  test("an injected shared span is excised exactly, from the larger id only") {
    val span = filler(10, 60)
    // pin DISTINCT boundary chars around the planted span in each doc —
    // a random filler gives the two contexts a 1/26 chance of agreeing on
    // the char adjacent to the span, which would legitimately extend the
    // repeated region by one (the first spec run hit exactly that)
    val c = filler(11, 72) + "z"
    val docs = Seq(
      (1L, filler(12, 89) + "q" + span + "q" + filler(13, 49)),
      (5L, c + span + "z" + filler(14, 43)),
      (9L, filler(15, 120))
    ).toDF("doc_id", "text")
    val got = SubstringDedup.spans(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // keeper doc 1 keeps its copy; doc 9 shares nothing; doc 5 loses
    // exactly the planted span: chars [|c|+1, |c|+60]
    assert(got.toSeq === Seq((5L, c.length + 1L, c.length + 60L)))
  }

  /** A REAL 40-bit collision under [[GramHashes]]' polynomial (found by
    * seeded birthday search over 26^40): two different 40-char grams with
    * the same hash — the exact failure the confirm step exists for.
    */
  private val CollA = "gftlgcjysihrghyqxtdchafjiululfwlktzmgyho"
  private val CollB = "qakftjzqeulppvwzyzurpadkfcdsphnxcnxbqsmu"

  test("a forced hash collision never excises real content (byte-exact confirm)") {
    // the collision is real: equal 40-bit hashes, different bytes
    assert(CollA !== CollB)
    val hA = GramHashes.compute(UTF8String.fromString(CollA)).toLongArray().toSeq
    val hB = GramHashes.compute(UTF8String.fromString(CollB)).toLongArray().toSeq
    assert(hA.size === 1 && hA === hB, s"collision pair drifted: $hA vs $hB")

    // doc 1 carries gram A (the keeper copy), doc 5 carries the COLLIDING
    // gram B (different bytes, same hash), doc 9 carries a TRUE copy of A.
    // Distinct boundary chars pin the expected span exactly (see above).
    val pre9 = filler(71, 66) + "z"
    val docs = Seq(
      (1L, filler(70, 83) + "q" + CollA + "q" + filler(72, 47)),
      (5L, filler(73, 58) + "x" + CollB + "x" + filler(74, 52)),
      (9L, pre9 + CollA + "z" + filler(75, 44))
    ).toDF("doc_id", "text")
    val got = SubstringDedup.spans(docs).orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // doc 9's true duplicate is cut; doc 5's collision is refused — the
    // UNCONFIRMED chain would have cut doc 5 at position 60 too
    assert(got.toSeq === Seq((9L, pre9.length + 1L, pre9.length + 40L)))

    // the documented MISS side of the trade: when the colliding gram wins
    // the keeper slot (smallest doc carries B), the true A-duplicate pair
    // fails the compare against B and is NOT cut — a missed excision,
    // never a false one
    val missDocs = Seq(
      (1L, filler(76, 61) + "q" + CollB + "q" + filler(77, 42)),
      (5L, filler(78, 57) + "x" + CollA + "x" + filler(79, 51)),
      (9L, filler(80, 64) + "z" + CollA + "z" + filler(81, 46))
    ).toDF("doc_id", "text")
    assert(SubstringDedup.spans(missDocs).isEmpty)
  }

  test("confirm_cuts kernel: bounds, wrong-length grams, order preserved") {
    import graft.functions.ConfirmCuts
    val text = filler(90, 100)
    def arr(ps: Seq[Long]): org.apache.spark.sql.catalyst.util.ArrayData =
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(ps.toArray)
    def sarr(ss: Seq[String]): org.apache.spark.sql.catalyst.util.ArrayData =
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(
        ss.map(UTF8String.fromString).toArray[Any])
    val g5 = text.substring(4, 44) // gram at 1-based pos 5
    val g61 = text.substring(60, 100) // the LAST valid gram (pos 61)
    val got = ConfirmCuts.compute(
      UTF8String.fromString(text),
      arr(Seq(0L, 5L, 5L, 61L, 62L, 200L)),
      sarr(Seq(g5, g5, "wrong-bytes-" + g5.drop(12), g61, g61, g5)))
    // pos 0 (out of range low), wrong bytes, pos 62 (gram would overrun),
    // pos 200 (out of range) all refused; true matches kept in order
    assert(got.toLongArray().toSeq === Seq(5L, 61L))
  }

  test("an exact copy is excised end-to-end; summary reports kept_chars 0") {
    val text = filler(20, 150)
    val docs = Seq((3L, text), (8L, text)).toDF("doc_id", "text")
    assert(
      SubstringDedup.spans(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
        Seq((8L, 1L, 150L)))
    val sum = SubstringDedup.summary(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(sum.toSeq === Seq(
      (3L, 150L, 0L, 0L, 150L),
      (8L, 150L, 1L, 150L, 0L)))
  }

  test("abutting spans from DIFFERENT keepers merge; a real unique hole splits") {
    val s1 = filler(30, 70)
    val s2 = filler(31, 65)
    // doc 10 carries s1, doc 20 carries s2, doc 50 carries both —
    // adjacent (merge into one span) and, in a second region far from the
    // first, s1 again after a 50-char unique hole (separate span)
    val pre = filler(32, 55)
    val mid = filler(33, 50)
    val docs = Seq(
      (10L, filler(34, 80) + s1 + filler(35, 48)),
      (20L, filler(36, 62) + s2 + filler(37, 71)),
      (50L, pre + s1 + s2 + mid + s1 + filler(38, 41))
    ).toDF("doc_id", "text")
    val got = SubstringDedup.spans(docs).orderBy("doc_id", "span_start").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val a = pre.length + 1L // s1 start in doc 50
    val b = a + s1.length + s2.length + mid.length // second s1 start
    assert(got.toSeq === Seq(
      // s1+s2 abut: their cut-position runs sit exactly K apart (the
      // straddling grams match nobody), so the interval rule merges them
      (50L, a, a + s1.length + s2.length - 1L),
      (50L, b, b + s1.length - 1L)))
  }

  test("cleaned text: spans stitched out exactly, keepers and unique docs verbatim") {
    val span = filler(40, 60)
    val preA = filler(41, 89) + "q"
    val postA = "q" + filler(42, 49)
    val preB = filler(43, 72) + "z"
    val postB = "z" + filler(44, 43)
    val solo = filler(45, 120)
    val docs = Seq(
      (1L, preA + span + postA),
      (5L, preB + span + postB),
      (9L, solo)
    ).toDF("doc_id", "text")
    val got = SubstringDedup.cleaned(docs).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq(
      (1L, preA + span + postA), // keeper verbatim
      (5L, preB + postB), // span stitched out
      (9L, solo)))
    // full duplicate → empty string survives (not null, not the text)
    val dup = Seq((2L, filler(46, 100)), (7L, filler(46, 100))).toDF("doc_id", "text")
    val g2 = SubstringDedup.cleaned(dup).orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(g2.toSeq === Seq((2L, filler(46, 100)), (7L, "")))
  }

  test("sampled twin is base-atomic: copies travel with their originals") {
    assumeTestdata(sf001)
    val twin = SubstringDedup.summarySampledU(Tables.documents(spark, sf001))
    val ids = twin.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(ids.nonEmpty)
    val base = ids.filter(_ < DedupCorpus.ExactDupOffset)
    // every kept %7 base brought its exact copy, every kept %11 its near
    // copy — and every kept copy's base is in the slice (no orphaned
    // copies whose keeper was sampled away)
    base.filter(_ % 7 == 0).foreach(b =>
      assert(ids.contains(b + DedupCorpus.ExactDupOffset), s"base $b missing copy"))
    base.filter(_ % 11 == 0).foreach(b =>
      assert(ids.contains(b + DedupCorpus.NearDupOffset), s"base $b missing near copy"))
    ids.filter(_ >= DedupCorpus.ExactDupOffset).foreach { c =>
      val b = if (c >= DedupCorpus.NearDupOffset) c - DedupCorpus.NearDupOffset
        else c - DedupCorpus.ExactDupOffset
      assert(base.contains(b), s"copy $c orphaned (base $b not kept)")
    }
  }

  test("incremental: delta spans cut against the index regardless of id order; " +
    "novel delta text untouched; base never rescanned semantics on the live corpus") {
    val span = filler(60, 70)
    val base = Seq((50L, filler(61, 80) + "q" + span + "q" + filler(62, 45)))
      .toDF("doc_id", "text")
    val idx = base
      .select(col("doc_id"),
        explode(array_distinct(graft.functions.GramHashes.gramHashes(col("text")))).as("h"))
      .groupBy("h").agg(min(col("doc_id")).as("min_doc"))
    val pre = filler(63, 66) + "z"
    val delta = Seq(
      (3L, pre + span + "z" + filler(64, 41)), // smaller id than base: still cut
      (7L, filler(65, 130)) // novel
    ).toDF("doc_id", "text")
    val got = SubstringDedup.summaryIncrementalFrom(idx, delta)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val d1len = (pre + span + "z" + filler(64, 41)).length.toLong
    assert(got.toSeq === Seq(
      (3L, d1len, 1L, 70L, d1len - 70L), // exactly the planted span
      (7L, 130L, 0L, 0L, 130L)))

    // live corpus: delta copies of INDEXED bases (base % DeltaMod != 0)
    // are fully excised; the artifact lands where declared and is reused
    assumeTestdata(sf001)
    val p1 = SubstringDedup.ensureSavedGramIndex(spark, sf001)
    assert(new java.io.File(s"$p1/_SUCCESS").exists())
    assert(SubstringDedup.ensureSavedGramIndex(spark, sf001) === p1)
    val inc = SubstringDedup.summaryIncremental(spark, sf001)
    val leaky = inc.filter(
      col("doc_id") >= DedupCorpus.ExactDupOffset &&
        (col("doc_id") % DedupCorpus.ExactDupOffset) % IncrementalDedup.DeltaMod =!= 0 &&
        col("n_chars") >= K && col("kept_chars") =!= 0)
    assert(leaky.count() === 0L)
    // and delta-original copies (base also in the delta, NOT indexed) are
    // not cut by their own base — within-batch dedup is out of scope
    assert(inc.count() > 0)
  }

  test("confirmed incremental: an index-hash collision cuts in the hash-only " +
    "twin but not in the confirmed one; true repeats cut in both") {
    val base = Seq(
      (50L, filler(100, 73) + "q" + CollA + "q" + filler(101, 48)))
      .toDF("doc_id", "text")
    val idx = SubstringDedup.gramIndex(base)
    val pre2 = filler(104, 59) + "z"
    val delta = Seq(
      (3L, filler(102, 61) + "x" + CollB + "x" + filler(103, 44)), // collider
      (7L, pre2 + CollA + "z" + filler(105, 51)) // true repeat of the base gram
    ).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect()
        .map(r => (r.getLong(0), r.getLong(2), r.getLong(3))).toSeq // (id, n_spans, cut)
    // hash-only: BOTH delta docs cut (the collider falsely)
    assert(rows(SubstringDedup.summaryIncrementalFrom(idx, delta)) ===
      Seq((3L, 1L, 40L), (7L, 1L, 40L)))
    // confirmed: only the true repeat is cut
    assert(rows(SubstringDedup.summaryIncrementalConfirmedFrom(idx, base, delta)) ===
      Seq((3L, 0L, 0L), (7L, 1L, 40L)))
    // and the v2 index carries usable keeper coordinates
    val k = idx.filter(org.apache.spark.sql.functions.col("min_pos").isNull).count()
    assert(k === 0L)
  }

  test("streaming bloom form: stream == batch across micro-batches, and " +
    "per-doc kept_chars never exceeds the exact incremental path's (no false negatives)") {
    assumeTestdata(sf001)
    val idx = spark.read.parquet(SubstringDedup.ensureSavedGramIndex(spark, sf001))
    val bits = SubstringDedup.indexBloomBits(idx)
    val delta = IncrementalDedup.deltaCorpus(Tables.documents(spark, sf001))
      .select("doc_id", "text")
    val batch = SubstringDedup.summaryPerRowBloom(delta, bits)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
      .toMap

    // stateless ⇒ the union of per-micro-batch outputs equals the batch run
    val rows = delta.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)](spark)
    val out = graft.streaming.StreamingSubstringDedup.excise(
      input.toDF().toDF("doc_id", "text"), bits)
    val q = out.writeStream.format("memory").queryName("sub_stream")
      .outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 3)
      input.addData(b1.toIndexedSeq: _*); q.processAllAvailable()
      input.addData(b2.toIndexedSeq: _*); q.processAllAvailable()
      val streamed = spark.table("sub_stream").collect()
        .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))))
        .toMap
      assert(streamed === batch)
    } finally q.stop()

    // bloom polarity: false positives only ever CUT MORE — every doc's
    // bloom kept_chars is bounded by the exact index-join path's
    val exact = SubstringDedup.summaryIncremental(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(batch.keySet === exact.keySet)
    batch.foreach { case (id, (_, _, _, kept)) =>
      assert(kept <= exact(id), s"doc $id: bloom kept $kept > exact ${exact(id)}")
    }
    // and the paths agree on the fully-excised set being non-trivial
    assert(batch.values.count(_._4 == 0L) > 0)
  }

  test("live corpus: every injected copy with >= K chars is fully excised") {
    assumeTestdata(sf001)
    val corpus = DedupCorpus.augment(Tables.documents(spark, sf001))
    val sum = SubstringDedup.summary(corpus)
    // exact copies (+100000) and near copies (+200000, a strict prefix of
    // their original) consist ENTIRELY of text present in a smaller-id
    // doc — every gram is duplicated with an earlier keeper
    val leaky = sum
      .filter(col("doc_id") >= DedupCorpus.ExactDupOffset &&
        col("n_chars") >= K && col("kept_chars") =!= 0)
      .count()
    assert(leaky === 0L)
    // totality: one summary row per corpus doc
    assert(sum.count() === corpus.count())
    // the keeper rule's one unconditional live consequence: the globally
    // smallest id has no earlier doc to defer to, so it cuts nothing.
    // (Originals CAN legitimately cut: the fixture's tiny vocabulary
    // yields real cross-original 40-char repeats — the first run of this
    // spec found two, and hand-checking confirmed genuine shared spans.)
    val minId = corpus.agg(min(col("doc_id"))).head.getLong(0)
    assert(sum.filter(col("doc_id") === minId).head.getLong(3) === 0L)
    // and the operator is non-vacuous on the live fixture
    assert(sum.agg(max(col("cut_chars"))).head.getLong(0) > 0L)
  }
}
