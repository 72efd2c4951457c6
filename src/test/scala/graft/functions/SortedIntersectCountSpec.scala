package graft.functions

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.{Prop, Test => SCTest}

import graft.SparkSpec

/** The native codegen'd merge-intersect must be value-identical to the
  * set-intersection cardinality on sorted distinct arrays (interpreted
  * eval property-checked driver-side against a plain-Scala reference;
  * codegen path checked on a Dataset), propagate nulls like a binary
  * expression, and run inside whole-stage codegen.
  */
class SortedIntersectCountSpec extends SparkSpec {
  import spark.implicits._

  test("property: equals the set-intersection size on sorted distinct arrays") {
    val prop = Prop.forAll { (a0: List[Long], b0: List[Long]) =>
      val a = a0.distinct.sorted
      val b = b0.distinct.sorted
      val expr = SortedIntersectCount(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType)))
      expr.eval(null) == a.toSet.intersect(b.toSet).size
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("golden values, null propagation, empty arrays (codegen path)") {
    val df = Seq(
      (Some(Seq(1L, 3L, 7L)), Some(Seq(3L, 7L, 9L))), // {3,7} → 2
      (Some(Seq(1L, 2L)), Some(Seq(3L, 4L))), // disjoint → 0
      (Some(Seq.empty[Long]), Some(Seq(1L))), // empty → 0
      (None, Some(Seq(1L)))
    ).toDF("a", "b")
    val out = df
      .select(SortedIntersectCount.sortedIntersectCount(col("a"), col("b")).as("c"))
      .collect()
    assert(out(0).getInt(0) === 2)
    assert(out(1).getInt(0) === 0)
    assert(out(2).getInt(0) === 0)
    assert(out(3).isNullAt(0))
  }

  test("runs inside whole-stage codegen (the point of the native expression)") {
    val df = spark.range(100)
      .select(array(col("id"), col("id") + 1).as("a"), array(col("id") + 1, col("id") + 2).as("b"))
      .select(SortedIntersectCount.sortedIntersectCount(col("a"), col("b")).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    val projLine = plan.linesIterator.find(_.contains("sorted_intersect_count"))
    assert(projLine.isDefined, plan.take(2000))
    assert(plan.contains("*("), plan.take(2000))
  }
}
