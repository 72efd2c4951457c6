package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The native codegen'd winnowing kernel must be value-identical to a
  * plain-Scala reference of the published algorithm (gram poly-hashes →
  * sliding window minima, property-checked through the codegen path),
  * count CODE POINTS the way `length`/`split("")`/`ascii` did in the HOF
  * spelling it replaced, and honor the too-short/null contracts.
  */
class WinnowMinsSpec extends SparkSpec {
  import spark.implicits._

  private val G = WinnowMins.GramLen
  private val W = WinnowMins.WinnowWindow

  /** Independent reference over a code-point sequence (same shape as the
    * PropertySpec winnowing reference, kept separate on purpose).
    */
  private def ref(s: String): List[Long] = {
    val codes = s.codePoints().toArray.map(_.toLong)
    val pow = (0 until G).scanLeft(1L)((a, _) => a * WinnowMins.PolyBase % WinnowMins.PolyMod)
    if (codes.length < G + W - 1) Nil
    else {
      val hs = (0 to codes.length - G).map { i =>
        (0 until G).map(j => codes(i + j) * pow(G - 1 - j)).sum % WinnowMins.PolyMod
      }
      (0 to hs.length - W).map(p => hs.slice(p, p + W).min).toList
    }
  }

  test("property: equals the Scala winnowing reference on random ASCII docs") {
    val docGen = Gen.chooseNum(0, 40).flatMap(n =>
      Gen.listOfN(n, Gen.chooseNum(32, 126).map(_.toChar)).map(_.mkString))
    val prop = Prop.forAll(Gen.listOf(docGen)) { docs: List[String] =>
      val out = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
        .select(col("doc_id"), WinnowMins.winnowMins(col("text")).as("m"))
        .orderBy("doc_id").collect().map(_.getSeq[Long](1).toList).toList
      out == docs.map(ref)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("code points, not UTF-16 units or bytes: multi-byte and astral chars") {
    // ü (2 UTF-8 bytes, 1 UTF-16 unit), 汉 (3 bytes), 𝄞 (4 bytes, a
    // SURROGATE PAIR in UTF-16) — the reference iterates real code points,
    // so agreement here pins the decode loop's Character.charCount stride
    val texts = Seq(
      "grüße und grüße!",       // latin-1 supplement
      "汉字处理汉字处理汉字处理", // CJK, 12 code points
      "ab𝄞cdef𝄞ghij𝄞klmnop",    // astral: charCount 2 per clef
      "𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞𝄞")           // 11 code points, exactly min length
    val out = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .select(col("doc_id"), WinnowMins.winnowMins(col("text")).as("m"))
      .orderBy("doc_id").collect().map(_.getSeq[Long](1).toList).toList
    assert(out === texts.map(ref).toList)
    assert(out.forall(_.nonEmpty))
  }

  test("malformed UTF-8 never reads out of bounds and counts exactly numChars") {
    import org.apache.spark.unsafe.types.UTF8String
    // parquet strings are not validated on write, so dirty corpora carry
    // stray continuation bytes (0x80–0xBF), invalid leads (≥ 0xF8), and
    // sequences truncated by end-of-string. The load-bearing invariant
    // (review r16): the decode's character count must equal Spark's OWN
    // numChars — what `length(text)` and `substring` index by — or every
    // position downstream (gram spans, excision boundaries) is off in
    // the malformed tail. The earlier per-invalid-byte convention broke
    // this on truncated multi-byte tails (decode 2 chars, numChars 1).
    val cases = Seq(
      // stray continuation byte mid-ASCII
      Array[Int](0x61, 0x80, 0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x6B),
      // invalid lead 0xFF
      Array[Int](0xFF, 0x61, 0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x6B),
      // truncated 2-byte sequence at end-of-string
      Array[Int](0x61, 0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x6B, 0xC3),
      // truncated 4-byte sequence at end-of-string (numChars counts ONE
      // trailing char here, not two — the reviewer's divergence case)
      Array[Int](0x61, 0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x6B, 0xF0, 0x9F),
      // truncated 3-byte sequence at end-of-string
      Array[Int](0x61, 0x62, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x6B, 0xE4, 0xB8))
    cases.foreach { ints =>
      val s = UTF8String.fromBytes(ints.map(_.toByte))
      val out = WinnowMins.compute(s) // must not throw
      // the winnowing shape derives from numChars — Spark's count, so
      // every substring/length computed on the same string lines up
      assert(out.numElements() === s.numChars - G - W + 2,
        s"numChars=${s.numChars} for ${ints.map(i => f"$i%02x").mkString(" ")}")
      // deterministic: a second pass is identical
      val out2 = WinnowMins.compute(UTF8String.fromBytes(ints.map(_.toByte)))
      assert(out.toLongArray().toSeq === out2.toLongArray().toSeq)
    }
    // a VALID multi-byte char adjacent to a malformed byte still decodes
    // as its full sequence (the guards only reroute genuinely invalid input)
    val mixed = UTF8String.fromBytes(
      (Seq(0x80) ++ "héllo wörld!".getBytes("UTF-8").map(_ & 0xFF)).map(_.toByte).toArray)
    val o = WinnowMins.compute(mixed)
    assert(o.numElements() === mixed.numChars - G - W + 2)
    assert(mixed.numChars === 13)
  }

  test("too-short yields empty array, null yields null, non-string rejected") {
    val df = Seq((0L, Some("x" * (G + W - 2))), (1L, Some("")), (2L, None))
      .toDF("doc_id", "text")
    val out = df.select(col("doc_id"), WinnowMins.winnowMins(col("text")).as("m"))
      .orderBy("doc_id").collect()
    assert(out(0).getSeq[Long](1) === Nil) // 10 chars: one short of a window
    assert(out(1).getSeq[Long](1) === Nil)
    assert(out(2).isNullAt(1))
    val err = intercept[Exception] {
      Seq(1L).toDF("x").select(expr("winnow_mins(x)")).collect()
    }
    assert(err.getMessage.contains("winnow_mins") ||
      err.getMessage.toLowerCase.contains("string"))
  }

  test("exact golden row: the winnowing guarantee holds on a known doc") {
    // every wmin is a gram hash of the doc, and consecutive selections are
    // at most W positions apart (the SIGMOD 2003 coverage guarantee)
    val s = "the quick brown fox jumps over the lazy dog"
    val mins = ref(s)
    val hs = {
      val codes = s.map(_.toLong)
      (0 to codes.length - G).map { i =>
        (0 until G).map(j => codes(i + j) * WinnowMins.PolyPow(G - 1 - j)).sum %
          WinnowMins.PolyMod
      }.toSet
    }
    assert(mins.toSet.subsetOf(hs))
    val got = Seq((0L, s)).toDF("doc_id", "text")
      .select(WinnowMins.winnowMins(col("text"))).head().getSeq[Long](0).toList
    assert(got === mins)
  }
}
