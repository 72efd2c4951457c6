package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables
import graft.similarity.SimilaritySearch

/** The loop-codegen band-key expression must be bit-identical to the
  * per-plane `when(dotQ > 0, 1<<i)` spelling it replaced (at every plane
  * budget the derivation can produce), propagate nulls, reject malformed
  * sign tables at analysis, and actually run inside whole-stage codegen —
  * the per-plane unroll's silent huge-method JIT fallback is the defect
  * this expression exists to close.
  */
class SignBandKeysSpec extends SparkSpec {
  import spark.implicits._

  /** The replaced spelling, kept here as the reference semantics. */
  private def unrolledKey(
      qv: org.apache.spark.sql.Column,
      signs: IndexedSeq[IndexedSeq[Int]],
      band: Int, bandBits: Int): org.apache.spark.sql.Column =
    (0 until bandBits)
      .map { i =>
        val planeSigns = signs(band * bandBits + i)
        val planeDot =
          SimilaritySearch.dotQ(qv, array(planeSigns.map(s => lit(s.toLong)): _*))
        when(planeDot > 0, lit(1L << i)).otherwise(lit(0L))
      }
      .reduce[org.apache.spark.sql.Column](_ + _)

  test("bit-identical to the per-plane unroll over the live corpus, 4 bands x 10 bits") {
    val numBands = 4
    val bandBits = 10 // the sf0.1x32 probe point that crossed the JIT cliff
    val signs = SimilaritySearch.signsFor(numBands * bandBits)
    val qv = SimilaritySearch.quantize(col("embedding"))
    val df = Tables.embeddings(spark, sf001)
      .select(qv.as("qv"))
      .select(
        SignBandKeys.bandKeys(col("qv"), signs, numBands).as("native"),
        array((0 until numBands).map(b => unrolledKey(col("qv"), signs, b, bandBits)): _*)
          .as("unrolled"))
    // null-SAFE inequality: a plain =!= drops null rows and would mask the
    // one real divergence mode (native returns NULL on null qv, the
    // unrolled otherwise(0) spelling returns zeros)
    assert(df.filter(not(col("native") <=> col("unrolled"))).count() === 0)
    assert(df.count() > 0)
  }

  test("bit-identical at the single-band SemanticDedup shape (1 x 20 bits, the width cap)") {
    val signs = SimilaritySearch.signsFor(20)
    val qv = SimilaritySearch.quantize(col("embedding"))
    val df = Tables.embeddings(spark, sf001)
      .select(qv.as("qv"))
      .select(
        SignBandKeys.bandKeys(col("qv"), signs, 1).getItem(0).as("native"),
        unrolledKey(col("qv"), signs, 0, 20).as("unrolled"))
    assert(df.filter(not(col("native") <=> col("unrolled"))).count() === 0)
    assert(df.count() > 0)
  }

  test("null qv propagates; short qv uses the common-prefix dot like dotQ") {
    val signs = IndexedSeq(IndexedSeq(1, -1, 1), IndexedSeq(-1, 1, 1))
    val df = Seq(
      (1L, Some(Seq(5L, 1L, 2L))), // p0: 5-1+2=6>0 -> bit0; p1: -5+1+2=-2 -> 0
      (2L, Some(Seq(1L))), // prefix dots: p0: 1>0 -> bit0; p1: -1 -> 0
      (3L, None)
    ).toDF("id", "qv")
    val out = df
      .select(col("id"), SignBandKeys.bandKeys(col("qv"), signs, 2).as("k"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Long](1) === Seq(1L, 0L))
    assert(out(1).getSeq[Long](1) === Seq(1L, 0L))
    assert(out(2).isNullAt(1))
  }

  test("analysis rejects ragged tables, non-divisor band counts, and empty signs") {
    val qv = typedlit(Seq(1L, 2L))
    val ragged = typedlit(Seq(Seq(1L, 2L), Seq(3L)))
    val square = typedlit(Seq(Seq(1L, 2L), Seq(3L, 4L)))
    def analyze(c: org.apache.spark.sql.Column): Unit =
      Seq((1L, 2L)).toDF("a", "b").select(c).queryExecution.analyzed
    intercept[org.apache.spark.sql.AnalysisException](analyze(call_function("sign_band_keys", qv, ragged, lit(1))))
    intercept[org.apache.spark.sql.AnalysisException](analyze(call_function("sign_band_keys", qv, square, lit(3))))
    intercept[org.apache.spark.sql.AnalysisException](analyze(call_function(
      "sign_band_keys", qv, typedlit(Seq.empty[Seq[Long]]), lit(1))))
    intercept[org.apache.spark.sql.AnalysisException](analyze(call_function(
      "sign_band_keys", qv, square, lit(null).cast("int"))))
    // null plane rows / null elements: the wildcard containsNull admits
    // them through the TYPE pattern, so the value scan must reject them
    // at analysis (a clean failure, not an executor NPE)
    intercept[org.apache.spark.sql.AnalysisException](analyze(call_function(
      "sign_band_keys", qv,
      typedlit(Seq(Some(Seq(1L, 2L)), None)), lit(1))))
    intercept[org.apache.spark.sql.AnalysisException](analyze(call_function(
      "sign_band_keys", qv,
      typedlit(Seq(Seq(Some(1L), None), Seq(Some(3L), Some(4L)))), lit(1))))
  }

  test("runs inside whole-stage codegen at the derived-width shape") {
    val signs = SimilaritySearch.signsFor(40)
    val qv = SimilaritySearch.quantize(col("embedding"))
    val df = Tables.embeddings(spark, sf001)
      .select(SignBandKeys.bandKeys(qv, signs, 4).as("k"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.contains("sign_band_keys"))
    assert(projLine.isDefined, plan.take(2000))
    assert(plan.contains("*("), plan.take(2000))
  }
}
