package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.DedupCorpus
import graft.queries.Tables

class CrossDocDedupSpec extends SparkSpec {
  import spark.implicits._

  test("dedupedParagraphs: global first occurrence wins, hand-checked") {
    val in = Seq(
      (1L, "a b\n\nc d\n\ne f"), //  all first occurrences
      (2L, "c d\n\ng h"), //          'c d' already seen in doc 1
      (3L, "a b\n\na b"), //          both occurrences lose to doc 1
      (4L, "g h\n\nz z") //           'g h' lost to doc 2, 'z z' novel
    ).toDF("doc_id", "text")
    val out = CrossDocDedup.dedupedParagraphs(in).orderBy("doc_id").collect()
    assert(out.map(_.getAs[String]("text")).toSeq ===
      Seq("a b\n\nc d\n\ne f", "g h", "", "z z"))
    assert(out.map(_.getAs[Long]("n_paras")).toSeq === Seq(3L, 2L, 2L, 2L))
    assert(out.map(_.getAs[Long]("n_kept")).toSeq === Seq(3L, 1L, 0L, 1L))
  }

  test("dedupedParagraphs: within-doc repeats also collapse to the first") {
    val in = Seq((7L, "p q\n\nr s\n\np q")).toDF("doc_id", "text")
    val out = CrossDocDedup.dedupedParagraphs(in).collect().head
    assert(out.getAs[String]("text") === "p q\n\nr s")
    assert(out.getAs[Long]("n_kept") === 2L)
  }

  test("pipeline: injected exact-copy docs lose every paragraph to their original") {
    val res = CrossDocDedup.pipeline(Tables.documents(spark, sf001))
    // exact copies (doc_id + 100000) repeat their original verbatim, so no
    // paragraph of theirs can be a global first occurrence
    val copies = res.filter(
      col("doc_id") >= DedupCorpus.ExactDupOffset &&
        col("doc_id") < DedupCorpus.NearDupOffset)
    assert(copies.count() > 0)
    assert(copies.filter(col("n_kept") =!= 0L).count() === 0)
    // originals below the offset are scanned before any injected copy, and
    // paragraph survival must never exceed the paragraph count
    assert(res.filter(col("n_kept") > col("n_paras")).count() === 0)
    // every input doc keeps its row
    assert(res.count() ===
      Derepeat.withParagraphs(
        DedupCorpus.augment(Tables.documents(spark, sf001))).count())
  }

  test("dedupedParagraphs agrees with a brute-force scala reimplementation") {
    val corpus = Derepeat.withParagraphs(
      DedupCorpus.augment(Tables.documents(spark, sf001)))
    val rows = corpus.select("doc_id", "text").as[(Long, String)].collect().sortBy(_._1)
    val seen = scala.collection.mutable.HashSet[String]()
    val expect = rows.map { case (id, text) =>
      val ps = text.split(Derepeat.ParaSep, -1)
      val kept = ps.filter(p => seen.add(p))
      (id, ps.length.toLong, kept.length.toLong, kept.mkString(Derepeat.ParaSep))
    }.toSeq
    val got = CrossDocDedup.dedupedParagraphs(corpus)
      .orderBy("doc_id")
      .as[(Long, Long, Long, String)]
      .collect()
      .toSeq
    assert(got === expect)
  }
}
