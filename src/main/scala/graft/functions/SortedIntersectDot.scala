package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, QuaternaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Sparse-vector dot product over two (keys, weights) aligned array pairs
  * — `Σ wa[i]·wb[j]` over positions with `ga[i] = gb[j]`, both key arrays
  * ASCENDING-sorted — as a native codegen'd two-pointer merge.
  *
  * This is the verification inner loop of the weighted-cosine all-pairs
  * join ([[graft.dedup.CosinePairs]]): millions of candidate pairs ×
  * ~vocab-size arrays, the weighted sibling of
  * [[SortedIntersectCount]] (same merge skeleton, a multiply-accumulate
  * instead of a counter). No composable spelling exists without building
  * a per-row map (`map_from_arrays` + lambda lookups — per-row hash
  * allocation, the exact churn the unweighted expression was built to
  * kill), so this goes straight to the codegen'd form.
  *
  * Semantics (pinned by the DuckDB oracle replaying `SUM(wa*wb)` over the
  * posting-list pair join): keys are DISTINCT non-null per array and
  * ascending; weights align positionally; null if any input array is
  * null. Callers own the sortedness contract (CosinePairs builds both
  * arrays from one `sort_array` over (g, w) structs).
  */
case class SortedIntersectDot(
    first: Expression,   // ga: sorted keys of a
    second: Expression,  // wa: weights of a, aligned to ga
    third: Expression,   // gb: sorted keys of b
    fourth: Expression)  // wb: weights of b, aligned to gb
  extends QuaternaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (children.forall(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires four array<bigint> inputs, got " +
        children.map(_.dataType.sql).mkString(", "))

  override def dataType: DataType = LongType

  override def prettyName: String = "sorted_intersect_dot"

  override protected def nullSafeEval(a: Any, aw: Any, b: Any, bw: Any): Any = {
    val ga = a.asInstanceOf[ArrayData]
    val wa = aw.asInstanceOf[ArrayData]
    val gb = b.asInstanceOf[ArrayData]
    val wb = bw.asInstanceOf[ArrayData]
    val (nx, ny) = (ga.numElements(), gb.numElements())
    var i = 0
    var j = 0
    var s = 0L
    while (i < nx && j < ny) {
      val xv = ga.getLong(i)
      val yv = gb.getLong(j)
      if (xv < yv) i += 1
      else if (xv > yv) j += 1
      else { s += wa.getLong(i) * wb.getLong(j); i += 1; j += 1 }
    }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, aw, b, bw) =>
      SortedMergeGen.twoPointer(ctx, a, b, ev.value,
        accType = "long", accInit = "0L",
        accStep = (acc, i, j) => s"$acc += $aw.getLong($i) * $bw.getLong($j)"))

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression, newFourth: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird, fourth = newFourth)
}

object SortedIntersectDot {

  /** Registration descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("sorted_intersect_dot"),
    new ExpressionInfo(classOf[SortedIntersectDot].getName, "sorted_intersect_dot"),
    (children: Seq[Expression]) => {
      require(children.size == 4, "sorted_intersect_dot takes exactly 4 arguments")
      SortedIntersectDot(children(0), children(1), children(2), children(3))
    })

  /** Column-API entry point (the [[DotProductQ.dotq]] self-registering
    * pattern).
    */
  def sortedIntersectDot(ga: Column, wa: Column, gb: Column, wb: Column): Column = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = descriptor
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    call_function("sorted_intersect_dot", ga, wa, gb, wb)
  }
}
