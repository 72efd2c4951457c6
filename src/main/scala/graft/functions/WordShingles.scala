package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Word k-gram shingles — `word_shingles(words, k)` = the array of
  * space-joined k-token windows of `words` (empty array when the doc has
  * fewer than k tokens) — as a NATIVE CODEGEN'D Catalyst expression.
  *
  * This is the shingling kernel under every near-dup family (MinHash
  * signatures, n-gram Jaccard, winnowing fingerprints) and the bigram leg
  * of the Gopher repetition signals. The composable spelling —
  * `transform(sequence(0, n-k), i => array_join(slice(w, i+1, k), ' '))` —
  * is a CodegenFallback higher-order function: every window walks an
  * interpreted slice + join expression tree, which measured as the single
  * largest per-row cost in the curation family (~2 ms/doc; the whole
  * repetition query dropped ~4× CPU when this landed). Here each window is
  * one `UTF8String.concatWs` over the backing array inside whole-stage
  * codegen.
  *
  * Semantics are pinned by the existing DuckDB oracles (list
  * comprehension over `array_to_string(words[i:i+k-1], ' ')`): windows in
  * order, elements joined by a single space; null tokens cannot occur in
  * the `split`-produced inputs this serves (a null element would join as
  * empty — callers own that contract, as with
  * [[SortedIntersectCount]]'s sortedness). Null array or null/non-positive
  * k yields null per standard null-intolerance.
  *
  * Registered as SQL function `word_shingles` through
  * [[graft.plans.GraftExtensions]] (`injectFunction`).
  */
case class WordShingles(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), IntegerType) => TypeCheckResult.TypeCheckSuccess
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, int) inputs, got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val w = a.asInstanceOf[ArrayData]
    val k = b.asInstanceOf[Int]
    if (k <= 0) return null
    val n = w.numElements()
    val m = n - k + 1
    if (m <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val out = new Array[Any](m)
      val sep = UTF8String.fromString(" ")
      var i = 0
      while (i < m) {
        val parts = new Array[UTF8String](k)
        var j = 0
        while (j < k) { parts(j) = w.getUTF8String(i + j); j += 1 }
        out(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, k) => {
      val n = ctx.freshName("n")
      val m = ctx.freshName("m")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val out = ctx.freshName("out")
      val parts = ctx.freshName("parts")
      val sep = ctx.addReferenceObj("sep", UTF8String.fromString(" "),
        classOf[UTF8String].getName)
      val utf8 = classOf[UTF8String].getName
      s"""
         |if ($k <= 0) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $w.numElements();
         |  int $m = $n - $k + 1;
         |  if ($m < 0) $m = 0;
         |  Object[] $out = new Object[$m];
         |  for (int $i = 0; $i < $m; $i++) {
         |    $utf8[] $parts = new $utf8[$k];
         |    for (int $j = 0; $j < $k; $j++) {
         |      $parts[$j] = $w.getUTF8String($i + $j);
         |    }
         |    $out[$i] = $utf8.concatWs($sep, $parts);
         |  }
         |  ${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object WordShingles {

  /** Registration descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("word_shingles"),
    new ExpressionInfo(classOf[WordShingles].getName, "word_shingles"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "word_shingles takes exactly 2 arguments")
      WordShingles(children(0), children(1))
    })

  /** Column-API entry point — drop-in for the transform/slice/array_join
    * HOF spelling. Self-registers in the active session like
    * [[DotProductQ.dotq]].
    */
  def wordShingles(words: Column, k: Int): Column = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = descriptor
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    call_function("word_shingles", words, org.apache.spark.sql.functions.lit(k))
  }
}
