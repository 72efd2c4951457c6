package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables
import graft.similarity.SimilaritySearch

/** The native codegen'd dot product must be value-identical to the
  * composable HOF spelling on real data, handle nulls like a binary
  * expression, and actually run inside whole-stage codegen.
  */
class DotProductQSpec extends SparkSpec {
  import spark.implicits._

  private def hofDot(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, _ * _), lit(0L), _ + _)

  test("value-identical to the HOF spelling over the embeddings corpus") {
    val qv = SimilaritySearch.quantize(col("embedding"))
    val both = Tables.embeddings(spark, sf001)
      .select(
        DotProductQ.dotq(qv, qv).as("native"),
        hofDot(qv, qv).as("hof"))
    assert(both.filter(col("native") =!= col("hof")).count() === 0)
    assert(both.count() > 0)
  }

  test("golden values, null propagation, length mismatch") {
    val df = Seq(
      (Some(Seq(1L, 2L, 3L)), Some(Seq(4L, 5L, 6L))), // 4+10+18 = 32
      (Some(Seq(2L)), Some(Seq(7L, 9L))), // common prefix: 14
      (None, Some(Seq(1L)))
    ).toDF("a", "b")
    val out = df.select(DotProductQ.dotq(col("a"), col("b")).as("d")).collect()
    assert(out(0).getLong(0) === 32L)
    assert(out(1).getLong(0) === 14L)
    assert(out(2).isNullAt(0))
  }

  test("runs inside whole-stage codegen (the point of the native expression)") {
    val qv = SimilaritySearch.quantize(col("embedding"))
    val df = Tables.embeddings(spark, sf001).select(DotProductQ.dotq(qv, qv).as("d"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    // the projection computing dot_product_q carries a codegen stage id
    // marker "*(n)"; an interpreted fallback would render it without one
    val projLine = plan.linesIterator.find(_.contains("dot_product_q"))
    assert(projLine.isDefined, plan.take(2000))
    assert(plan.contains("*("), plan.take(2000))
  }
}
