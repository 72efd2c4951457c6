package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Exact integer dot product of two `ARRAY<BIGINT>` columns as a NATIVE
  * CODEGEN'D Catalyst expression.
  *
  * This is the hot inner loop of every similarity-search operator (the
  * quantized cosine numerator and the LSH plane signs). The composable
  * spelling — `aggregate(zip_with(a, b, _ * _), 0L, _ + _)` — is
  * semantically identical but runs INTERPRETED: higher-order functions
  * allocate a lambda frame per element and disqualify the enclosing
  * projection from whole-stage codegen. This expression generates a tight
  * primitive `long` loop instead (preference order per the build brief:
  * compose built-ins where adequate; custom `Expression` with `doGenCode`
  * where the built-ins can't express the semantics EFFICIENTLY).
  *
  * Registered as SQL function `dot_product_q` through
  * [[graft.plans.GraftExtensions]] (`injectFunction`), which also makes it
  * available to plain SQL users of the session.
  *
  * Semantics (pinned by the DuckDB oracle replaying the same math): sum
  * over the common prefix length of `a[i] * b[i]` as 64-bit integers; null
  * if either array is null. Elements are assumed non-null (quantized
  * vectors are produced by `round()` over non-null embeddings).
  */
case class DotProductQ(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<bigint> inputs, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "dot_product_q"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += x.getLong(i) * y.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DotProductQ {

  /** Registration descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("dot_product_q"),
    new ExpressionInfo(classOf[DotProductQ].getName, "dot_product_q"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "dot_product_q takes exactly 2 arguments")
      DotProductQ(children(0), children(1))
    })

  /** Column-API entry point: `dotq(a, b)` — drop-in for the HOF spelling.
    * Resolves through the session function registry; registers itself in
    * the active session when absent, so the Column API works in ANY
    * session, not only ones built with [[graft.plans.GraftExtensions]]
    * (the extension still registers it eagerly for plain-SQL users).
    */
  def dotq(a: Column, b: Column): Column = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = descriptor
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    call_function("dot_product_q", a, b)
  }
}
