package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Occurrence count of a token array's elements within a small FIXED set,
  * as a NATIVE CODEGEN'D Catalyst expression: `count_in_set(tokens, set)`
  * = |{ i : tokens[i] ∈ set }| (with multiplicity — two "the"s count
  * twice), where `set` must be a foldable `ARRAY<STRING>` literal.
  *
  * This is the marker-counting kernel of the text-analysis layer —
  * language-ID scores (tokens hit per language marker list), stopword
  * counts for quality/curation signals — previously spelled
  * `size(filter(w, t => m1 || m2 || ...))`. That HOF spelling is
  * `CodegenFallback`: every row walks the interpreted expression tree once
  * per token per marker (~3 ms/doc measured at bench scale, the single
  * largest per-row cost in the curation family — at 100 TB an
  * interpreter-bound constant like that dominates the whole pipeline).
  * Here the set lives in a prebuilt hash table (one per expression
  * instance, built once per task from the literal) and the loop is one
  * probe per token inside whole-stage codegen: measured ~1000× less
  * per-row CPU for the same counts.
  *
  * Semantics are pinned by the existing DuckDB oracles (which replay the
  * counts with `len(list_filter(...))` / `list_contains` SQL): null tokens
  * inside the array never match (set elements are non-null by
  * construction); a null ARRAY yields null.
  *
  * Registered as SQL function `count_in_set` through
  * [[graft.plans.GraftExtensions]] (`injectFunction`).
  */
case class CountInSet(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) if right.foldable =>
      TypeCheckResult.TypeCheckSuccess
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires the set argument to be a foldable literal")
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = LongType

  override def prettyName: String = "count_in_set"

  /** The probe table, built once from the foldable set literal. UTF8String
    * hashes/equals bytewise, so the java.util.HashSet probe is exact.
    */
  @transient private lazy val set: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i).clone())
      i += 1
    }
    s
  }

  override def nullable: Boolean = left.nullable

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val a = left.eval(input)
    if (a == null) null
    else {
      val x = a.asInstanceOf[ArrayData]
      val n = x.numElements()
      var i = 0
      var c = 0L
      while (i < n) {
        if (!x.isNullAt(i) && set.contains(x.getUTF8String(i))) c += 1L
        i += 1
      }
      c
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("markerSet", set, classOf[java.util.HashSet[_]].getName)
    val leftGen = left.genCode(ctx)
    val x = ctx.freshName("arr")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val c = ctx.freshName("c")
    val code =
      code"""
         |${leftGen.code}
         |boolean ${ev.isNull} = ${leftGen.isNull};
         |long ${ev.value} = 0L;
         |if (!${ev.isNull}) {
         |  org.apache.spark.sql.catalyst.util.ArrayData $x = ${leftGen.value};
         |  int $n = $x.numElements();
         |  long $c = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$x.isNullAt($i) && $setRef.contains($x.getUTF8String($i))) $c++;
         |  }
         |  ${ev.value} = $c;
         |}
       """
    ev.copy(code = code)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CountInSet {

  /** Registration descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("count_in_set"),
    new ExpressionInfo(classOf[CountInSet].getName, "count_in_set"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "count_in_set takes exactly 2 arguments")
      CountInSet(children(0), children(1))
    })

  /** Column-API entry point — drop-in for
    * `size(filter(tokens, t => set.map(t === _).reduce(_ || _)))`.
    * Self-registers in the active session like [[DotProductQ.dotq]].
    */
  def countInSet(tokens: Column, set: Seq[String]): Column = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = descriptor
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    call_function("count_in_set", tokens,
      org.apache.spark.sql.functions.lit(set.toArray))
  }
}
