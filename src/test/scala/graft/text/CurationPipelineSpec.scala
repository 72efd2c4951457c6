package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class CurationPipelineSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)

  test("verdicts: each rule fires on a crafted document, in contract order") {
    // top word 'and' at 2/29 stays under MaxTopWordsFrac; 7 stopword hits
    // clear MinStopRatio
    val keeper = "the cat and a dog walk to town in spring they see one bird " +
      "two fish and talk of warm weather today while friends wave hello near tall trees"
    val in = Seq(
      // German stopwords dominate → 'lang'
      (1L, "der hund und die katze ist ein tier und das haus ist nicht klein " +
        "und der baum ist ein baum und die sonne ist nicht kalt"),
      (2L, "the cat is small"), //                               'short'
      // 25 single-letter words → mean word len 1 → 'word_len' (long enough,
      // and 'a' keeps enough stopword hits that 'stop' would not fire first)
      (3L, Seq.fill(25)("a").mkString(" ")),
      // enough words, no stopwords at all → 'stop'
      (4L, Seq.tabulate(25)(i => s"word$i xyz").mkString(" ")),
      // stopword-bearing but one word repeated massively → 'repetition'
      (5L, ("the and of to is a in " + Seq.fill(40)("spam").mkString(" ")) +
        " cat dog bird fish tree house sun moon star rain"),
      (6L, keeper) //                                            'keep'
    ).toDF("doc_id", "text")
    val v = CurationPipeline.verdicts(in).orderBy("doc_id")
      .select("doc_id", "verdict").as[(Long, String)].collect().toMap
    assert(v(1L) === "lang")
    assert(v(2L) === "short")
    assert(v(3L) === "word_len")
    assert(v(4L) === "stop")
    assert(v(5L) === "repetition")
    assert(v(6L) === "keep")
  }

  test("verdicts: 'special' fires when punctuation dominates") {
    val in = Seq(
      (1L, Seq.fill(25)("ok!!!").mkString(" ") + " the and of to is a in the and of")
    ).toDF("doc_id", "text")
    val v = CurationPipeline.verdicts(in).collect().head
    assert(v.getAs[String]("verdict") === "special")
    assert(!v.getAs[Boolean]("keep"))
  }

  test("corpus run: every doc gets exactly one verdict, several rules bite, keep is consistent") {
    val v = CurationPipeline.verdicts(docs).cache()
    try {
      assert(v.count() === docs.count())
      assert(v.filter(col("keep") =!= (col("verdict") === "keep")).count() === 0)
      val fired = v.select("verdict").distinct().as[String].collect().toSet
      assert(fired.contains("keep"))
      assert((fired - "keep").nonEmpty) // the thresholds actually bite
      // funnel totals reconcile with the verdict table
      val funnel = CurationPipeline.funnel(docs)
      assert(funnel.agg(sum("n_docs")).as[Long].head === docs.count())
    } finally v.unpersist()
  }

  test("per-source funnel: rolls up exactly to the global funnel and covers every source") {
    val bySource = CurationPipeline.funnelBySource(docs)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val global = CurationPipeline.funnel(docs)
      .collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    // summing the source breakdown per verdict must reproduce the global
    // funnel bit-for-bit
    val rolled = bySource.groupBy(_._2).map { case (verdict, rs) =>
      verdict -> (rs.map(_._3).sum, rs.map(_._4).sum)
    }
    assert(rolled === global)
    // every corpus source appears (no source silently dropped)
    val sources = docs.select("source").distinct().as[String].collect().toSet
    assert(bySource.map(_._1).toSet === sources)
  }
}
