package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Intersection size of two ASCENDING-SORTED `ARRAY<BIGINT>` set columns as
  * a NATIVE CODEGEN'D Catalyst expression (two-pointer merge).
  *
  * This is the verification inner loop of the prefix-filtered Jaccard join
  * ([[graft.dedup.JaccardPairs]]): millions of candidate pairs × ~doc-size
  * arrays. The composable spelling — `size(array_intersect(a, b))` — is
  * semantically identical on set-valued inputs but builds a hash set PER
  * ROW, whose allocation churn turned the verify stages GC-bound at probe
  * scale (measured ~23 µs/row at sf0.1×32; the merge loop is pure
  * primitive compares with zero allocation). Preference order per the
  * build brief: compose built-ins where adequate; custom `Expression` with
  * `doGenCode` where the built-ins can't express the semantics
  * EFFICIENTLY.
  *
  * Registered as SQL function `sorted_intersect_count` through
  * [[graft.plans.GraftExtensions]] (`injectFunction`).
  *
  * Semantics (pinned by the DuckDB oracle replaying `count(*)` over the
  * posting-list pair join): |A ∩ B| for arrays holding DISTINCT non-null
  * elements in ascending order; null if either array is null. Inputs that
  * violate sortedness/distinctness give engine-specific counts — callers
  * own the contract (JaccardPairs sorts with `array_sort` over
  * per-doc-distinct hashes).
  */
case class SortedIntersectCount(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (nx, ny) = (x.numElements(), y.numElements())
    var i = 0
    var j = 0
    var c = 0
    while (i < nx && j < ny) {
      val xv = x.getLong(i)
      val yv = y.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { c += 1; i += 1; j += 1 }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      SortedMergeGen.twoPointer(ctx, a, b, ev.value,
        accType = "int", accInit = "0",
        accStep = (acc, _, _) => s"$acc++"))

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object SortedIntersectCount {

  /** Registration descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("sorted_intersect_count"),
    new ExpressionInfo(classOf[SortedIntersectCount].getName, "sorted_intersect_count"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "sorted_intersect_count takes exactly 2 arguments")
      SortedIntersectCount(children(0), children(1))
    })

  /** Column-API entry point: `sortedIntersectCount(a, b)` — drop-in for
    * `size(array_intersect(a, b))` on sorted distinct arrays. Resolves
    * through the session function registry, self-registering when absent
    * (same pattern as [[DotProductQ.dotq]]).
    */
  def sortedIntersectCount(a: Column, b: Column): Column = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = descriptor
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    call_function("sorted_intersect_count", a, b)
  }
}
