package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class VocabDiffSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built corpora: exclusive words survive with zeros on the other side") {
    val docs = Seq(
      (1L, "src0", "alpha beta beta"),
      (2L, "src1", "beta gamma"),
      (3L, "src2", "ignored entirely")
    ).toDF("doc_id", "source", "text")
    val out = VocabDiff.diff(docs).as[(String, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      ("alpha", 1L, 0L, 1L),
      ("beta", 2L, 1L, 1L),
      ("gamma", 0L, 1L, -1L)))
  }

  test("live corpus: per-side totals conserve the sources' token counts") {
    val docs = graft.queries.Tables.documents(spark, sf001)
    val out = VocabDiff.diff(docs)
    def tokens(src: String) = docs.filter(col("source") === src)
      .select(explode(graft.dedup.Hashing.words(col("text"))).as("w"))
      .filter(col("w") =!= "").count()
    assert(out.agg(sum("cnt_a")).head.getLong(0) === tokens("src0"))
    assert(out.agg(sum("cnt_b")).head.getLong(0) === tokens("src1"))
    // diff is consistent everywhere and the sources genuinely differ
    // (exclusive-word DIRECTIONS are data-dependent at tiny SF — the
    // hand-built fixture above pins both full-outer null paddings)
    assert(out.filter(col("diff") =!= col("cnt_a") - col("cnt_b")).count() === 0)
    assert(out.filter(col("diff") =!= 0).count() > 0, "sources identical?")
  }
}
