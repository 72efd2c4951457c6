package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BigramLmSpec extends SparkSpec {

  import spark.implicits._

  test("hand-computed score on a three-doc corpus") {
    // corpus: "a b a b" / "a b" / "x"
    // unigrams: a:3 b:3 x:1 → V = 3
    // bigrams:  "a b":3  "b a":1
    // p_e6("a b") = (3+1)·1e6 div (3+3) = 666666
    // p_e6("b a") = (1+1)·1e6 div (3+3) = 333333
    // doc 1: (2·666666 + 1·333333) div 3 = 555555 ; doc 2: 666666 ; doc 3: 0
    val docs = Seq((1L, "a b a b"), (2L, "a b"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = BigramLm.scores(docs).orderBy("doc_id").collect()
    assert(out.map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq ===
      Seq((1L, 3L, 555555L), (2L, 1L, 666666L), (3L, 0L, 0L)))
  }

  test("edge delimiters don't fabricate empty-token bigrams") {
    // "  a b." tokenizes to [a, b] — one bigram, not three
    val docs = Seq((1L, "  a b."), (2L, "a b")).toDF("doc_id", "text")
    val out = BigramLm.scores(docs).orderBy("doc_id").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(1L, 1L))
    // identical token streams score identically regardless of punctuation
    assert(out(0).getLong(2) === out(1).getLong(2))
  }

  test("corpus run: every doc present once; duplicated text scores high") {
    val docs = graft.queries.Tables.documents(spark, sf001)
    val out = BigramLm.scores(docs)
    assert(out.count() === docs.count())
    // near-dup corpus structure: docs sharing bigrams with their copies
    // must land above the minimum (the model saw their transitions ≥2×)
    val scores = out.filter(col("n_bigrams") > 0).select("lm_score_e6")
      .collect().map(_.getLong(0))
    assert(scores.distinct.length > 10, "scores should spread, not collapse")
  }

  test("plan: the only cartesian is the one-row V broadcast") {
    val docs = graft.queries.Tables.documents(spark, sf001)
    val plan = BigramLm.scores(docs).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian product:\n$plan")
  }
}
