package graft.queries

import graft.SparkSpec

/** Word-count pipeline details not covered by the oracle: the URL-decode
  * branch (P2, RandomizedWordCount.java:41-53) and the two-level numeric
  * filtering (whole-line digit drop + numeric-token drop).
  */
class WordCountSpec extends SparkSpec {
  import spark.implicits._

  private def counts(df: org.apache.spark.sql.DataFrame): Map[String, Long] =
    df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("urlDecode=true unescapes percent-encodings before tokenizing (P2)") {
    val docs = Seq("hello%20world", "caf%c3%a9 time").toDF("text")
    val out = counts(ReferenceQueries.wordCount(docs, urlDecode = true))
    // %20 → space → two tokens; %c3%a9 → é (non-alphanumeric delimiter) → caf + time
    assert(out === Map("hello" -> 1L, "world" -> 1L, "caf" -> 1L, "time" -> 1L))
  }

  test("urlDecode=true survives stray % and + (the reference's pre-escapes)") {
    val docs = Seq("100% sure + more").toDF("text")
    // whole line contains digits → dropped entirely by the digit-line filter
    assert(counts(ReferenceQueries.wordCount(docs, urlDecode = true)).isEmpty)
    val noDigits = Seq("sure% plus + stuff").toDF("text")
    val out = counts(ReferenceQueries.wordCount(noDigits, urlDecode = true))
    assert(out.keySet === Set("sure", "plus", "stuff"))
  }

  test("digit-line drop vs numeric-token drop operate at different granularities (P2+P3)") {
    // line with digits anywhere → whole line dropped
    val out1 = counts(ReferenceQueries.wordCount(Seq("good line", "bad 42 line").toDF("text")))
    assert(out1 === Map("good" -> 1L, "line" -> 1L))
  }
}
