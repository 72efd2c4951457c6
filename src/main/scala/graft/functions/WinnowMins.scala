package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.functions.call_function
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing window-minima — `winnow_mins(text)` = the array of sliding
  * [[WinnowMins.WinnowWindow]]-minima over the [[WinnowMins.GramLen]]-char
  * polynomial gram hashes of `text` (empty array when the doc is too short
  * for one full window) — as a NATIVE CODEGEN'D Catalyst expression.
  *
  * This is the fingerprinting kernel under [[graft.text.TextAnalysis
  * .fingerprints]] and the cross-doc [[graft.text.SharedSpans]] pair
  * detector (Schleimer/Wilkerson/Aiken, "Winnowing: Local Algorithms for
  * Document Fingerprinting", SIGMOD 2003). The composable spelling —
  * `split` to per-char strings, `ascii` per char, a `transform` computing
  * each gram hash via 8 `element_at` lookups, and a second `transform`
  * taking `array_min(slice(...))` per window position — walks four
  * interpreted higher-order lambdas over every character of the corpus
  * and allocates a one-char UTF8String per input char; it measured as the
  * #1 per-row cost of the two heaviest text queries (`text_fingerprint`
  * 35.8 s / `dedup_shared_spans` 48.1 s CPU at sf0.1, r14 ledger). Here
  * the whole chain is one compiled pass per row: code points decoded
  * straight off the string, 8 multiply-adds per gram, 3 compares per
  * window, primitive arrays throughout.
  *
  * Semantics are pinned bit-for-bit by the existing DuckDB winnowing
  * oracle ([[graft.text.TextAnalysis.winnowCtes]]) and the independent
  * Scala reference in PropertySpec: `codes[i]` is the i-th CODE POINT
  * (Spark `split("")`+`ascii` and DuckDB `substr`+`ascii` both operate on
  * code points), `h[k] = (Σ_j codes[k+j]·B^(7−j)) mod P` with one mod
  * AFTER the full 8-term sum (code points ≤ 0x10FFFF and B^j mod P <
  * 2^31 keep the sum < 2^54 — exact in a long), and `wmins[p] =
  * min(h[p..p+3])`. Output order is position order, duplicates kept —
  * `array_distinct`/`array_min` stay caller-side so the fingerprint
  * profile and the exploded pair stream share one kernel.
  *
  * Registered as SQL function `winnow_mins` through
  * [[graft.plans.GraftExtensions]] (`injectFunction`).
  */
case class WinnowMins(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "winnow_mins"

  override protected def nullSafeEval(s: Any): Any =
    WinnowMins.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("winnowMins", WinnowMins, WinnowMins.getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WinnowMins {

  /** Gram length in characters: a shared fingerprint witnesses a shared
    * ≥8-char span.
    */
  val GramLen = 8

  /** Winnowing window: every 4 consecutive gram positions contribute at
    * least one selected fingerprint (the coverage guarantee).
    */
  val WinnowWindow = 4

  /** Rolling polynomial base/modulus (B, P): engine-exact integer
    * arithmetic, replayed verbatim by the DuckDB oracle.
    */
  val PolyBase = 131L
  val PolyMod = 2147483647L // 2^31 - 1

  /** B^e mod P for e = 0..GramLen-1. */
  val PolyPow: IndexedSeq[Long] =
    (0 until GramLen).scanLeft(1L)((acc, _) => acc * PolyBase % PolyMod).take(GramLen)

  // gram position j multiplies code[k+j] by B^(GramLen-1-j)
  private val powForJ: Array[Long] =
    Array.tabulate(GramLen)(j => PolyPow(GramLen - 1 - j))

  /** One compiled pass: code points → gram hashes → window minima.
    * Called per row from both the interpreted `nullSafeEval` and the
    * generated code (a single static-shaped call per row keeps the
    * operator inside whole-stage codegen; the loop itself JITs).
    */
  def compute(s: UTF8String): ArrayData = {
    val (codes, n) = Utf8Codes.decode(s)
    val ngrams = n - (GramLen - 1)
    val m = ngrams - (WinnowWindow - 1)
    if (m <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val hs = new Array[Long](ngrams)
    var k = 0
    while (k < ngrams) {
      var acc = 0L
      var j = 0
      while (j < GramLen) {
        acc += codes(k + j) * powForJ(j)
        j += 1
      }
      hs(k) = acc % PolyMod
      k += 1
    }
    val out = new Array[Long](m)
    var p = 0
    while (p < m) {
      var mn = hs(p)
      var q = 1
      while (q < WinnowWindow) {
        val v = hs(p + q)
        if (v < mn) mn = v
        q += 1
      }
      out(p) = mn
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Registration descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("winnow_mins"),
    new ExpressionInfo(classOf[WinnowMins].getName, "winnow_mins"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "winnow_mins takes exactly 1 argument")
      WinnowMins(children.head)
    })

  /** Column-API entry point — drop-in for the split/ascii/transform HOF
    * spelling. Self-registers in the active session like
    * [[DotProductQ.dotq]].
    */
  def winnowMins(text: Column): Column = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = descriptor
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    call_function("winnow_mins", text)
  }
}
