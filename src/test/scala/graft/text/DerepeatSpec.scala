package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class DerepeatSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)

  test("derepeated: keeps first occurrences in order, hand-checked") {
    val in = Seq(
      (1L, "a b\n\nc d\n\na b\n\ne f\n\nc d"), // dupes at 3 and 5
      (2L, "solo"), //                            single paragraph
      (3L, "x\n\nx\n\nx") //                      all same → one survives
    ).toDF("doc_id", "text")
    val out = Derepeat.derepeated(in).orderBy("doc_id").collect()
    assert(out(0).getAs[Long]("n_paras") === 5L)
    assert(out(0).getAs[Long]("n_kept") === 3L)
    assert(out(0).getAs[String]("text") === "a b\n\nc d\n\ne f")
    assert(out(1).getAs[Long]("n_paras") === 1L)
    assert(out(1).getAs[Long]("n_kept") === 1L)
    assert(out(1).getAs[String]("text") === "solo")
    assert(out(2).getAs[Long]("n_paras") === 3L)
    assert(out(2).getAs[Long]("n_kept") === 1L)
    assert(out(2).getAs[String]("text") === "x")
  }

  test("withParagraphs: chunking is exact and the injected repetition lands " +
    "exactly on doc_id % 3 == 0") {
    val shaped = Derepeat.withParagraphs(docs)
    assert(shaped.count() === docs.count())
    // paragraph words re-concatenate to the original token stream (plus the
    // injected copy of paragraph 1 for doc_id % 3 == 0)
    val probe = shaped
      .select(col("doc_id"), split(col("text"), Derepeat.ParaSep).as("ps"))
      .select(col("doc_id"), col("ps"),
        size(col("ps")).as("np"),
        (col("doc_id") % 3 === 0).as("injected"))
    assert(probe.filter(col("injected") &&
      element_at(col("ps"), -1) =!= element_at(col("ps"), 1)).count() === 0)
    // every synthesized paragraph has at most ParaWords words
    val wide = shaped
      .select(explode(split(col("text"), Derepeat.ParaSep)).as("p"))
      .filter(size(split(col("p"), " ")) > Derepeat.ParaWords)
    assert(wide.count() === 0)
  }

  test("derepeated over the synthesized corpus removes exactly the injected copies") {
    val out = Derepeat.derepeated(Derepeat.withParagraphs(docs))
    // the fixture vocabulary makes natural 10-word-paragraph collisions
    // vanishingly rare; every doc_id % 3 == 0 doc loses exactly its one
    // injected copy, every other doc loses nothing
    val bad = out.filter(
      when(col("doc_id") % 3 === 0, col("n_kept") =!= col("n_paras") - 1)
        .otherwise(col("n_kept") =!= col("n_paras")))
    assert(bad.count() === 0)
    // cleaned text never contains a repeated paragraph
    val still = Derepeat.derepeated(out.select(col("doc_id"), col("text")))
      .filter(col("n_kept") =!= col("n_paras"))
    assert(still.count() === 0)
  }
}
