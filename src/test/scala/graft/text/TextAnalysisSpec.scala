package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)

  test("languageId: scores bounded by word count, argmax tie-break is declaration order") {
    val out = TextAnalysis.languageId(docs)
    assert(out.count() === docs.count())
    assert(out.filter(!col("pred_lang").isin(TextAnalysis.Markers.map(_._1): _*)).count() === 0)
    // hand-checked: a doc of pure English stopwords predicts en
    val hand = TextAnalysis.languageId(Seq((1L, "the and of the is")).toDF("doc_id", "text")).head()
    assert(hand.getAs[Long]("s_en") === 5L)
    assert(hand.getAs[String]("pred_lang") === "en")
    // tie (all scores 0) falls to the first language
    val tie = TextAnalysis.languageId(Seq((1L, "zzz qqq")).toDF("doc_id", "text")).head()
    assert(tie.getAs[String]("pred_lang") === "en")
  }

  test("repetitionSignals: golden hand-computed rows incl. the short-doc null edge") {
    val in = Seq(
      (1L, "a b a b a"), //  5 words {a:3,b:2}; 4 bigrams {a b:2, b a:2}
      (2L, "x") //           1 word, no bigrams → null bigram columns
    ).toDF("doc_id", "text")
    val out = TextAnalysis.repetitionSignals(in).orderBy("doc_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("n_words") === 5L)
    assert(r1.getAs[Long]("n_distinct_words") === 2L)
    assert(r1.getAs[Double]("dup_words_frac") === 3.0 / 5)
    assert(r1.getAs[Double]("top_words_frac") === 3.0 / 5)
    assert(r1.getAs[Long]("n_bigrams") === 4L)
    assert(r1.getAs[Double]("dup_bigrams_frac") === 0.5)
    assert(r1.getAs[Double]("top_bigrams_frac") === 0.5)
    val r2 = out(1)
    assert(r2.getAs[Long]("n_words") === 1L)
    assert(r2.getAs[Double]("dup_words_frac") === 0.0)
    assert(r2.isNullAt(r2.fieldIndex("n_bigrams")))
    // corpus sanity: fractions bounded, every doc present
    val corpus = TextAnalysis.repetitionSignals(docs)
    assert(corpus.count() === docs.count())
    assert(corpus.filter(col("dup_words_frac") < 0 || col("dup_words_frac") >= 1 ||
      col("top_words_frac") <= 0 || col("top_words_frac") > 1).count() === 0)
  }

  test("qualityScore: ratios in [0,1], quality in [0,1], golden hand-computed row") {
    val out = TextAnalysis.qualityScore(docs)
    assert(out.filter(col("stop_ratio") < 0 || col("stop_ratio") > 1).count() === 0)
    assert(out.filter(col("quality") < 0 || col("quality") > 1).count() === 0)
    // "the cat sat" → 11 chars, 3 words, 1 stopword, 0 special, mwl 3.0
    val g = TextAnalysis.qualityScore(Seq((1L, "the cat sat")).toDF("doc_id", "text")).head()
    assert(g.getAs[Long]("n_chars") === 11L)
    assert(g.getAs[Long]("n_words") === 3L)
    assert(g.getAs[Long]("n_stop") === 1L)
    assert(g.getAs[Long]("n_special") === 0L)
    assert(g.getAs[Double]("mean_word_len") === 3.0)
    assert(math.abs(g.getAs[Double]("quality") - (1.0 / 3 * 0.5 + 0.3 + 0.2)) < 1e-12)
  }

  test("tokenCounts: golden row and corpus sanity") {
    val g = TextAnalysis.tokenCounts(Seq((1L, "Hello, world 42!")).toDF("doc_id", "text")).head()
    assert(g.getAs[Long]("tok_ws") === 3L) // Hello, | world | 42!
    assert(g.getAs[Long]("tok_re") === 5L) // hello , world 42 !
    assert(g.getAs[Long]("tok_bpe_est") === 4L) // ceil(16/4)
    val out = TextAnalysis.tokenCounts(docs)
    assert(out.filter(col("tok_re") < col("tok_ws")).count() === 0)
  }

  test("fingerprints: winnowing selects a subset of gram hashes, deterministic") {
    val out = TextAnalysis.fingerprints(docs)
    assert(out.count() === docs.filter(length(col("text")) >= TextAnalysis.GramLen).count())
    // winnowing guarantee: ~1 fingerprint per window → n_fp well under gram count
    val row = out.join(docs, "doc_id")
      .select(col("n_fp"), (length(col("text")) - (TextAnalysis.GramLen - 1)).as("n_grams"))
      .filter(col("n_fp") > col("n_grams"))
    assert(row.count() === 0)
    // deterministic across runs
    val a = out.orderBy("doc_id").collect()
    val b = TextAnalysis.fingerprints(docs).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }
}
