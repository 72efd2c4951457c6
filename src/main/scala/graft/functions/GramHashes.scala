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

/** Position-indexed K-gram rolling hashes — `gram_hashes(text)` = the
  * array of [[GramHashes.GramLen]]-char polynomial hashes at EVERY
  * character position of `text` (element i = the hash of the gram
  * starting at 1-based position i+1; empty array when the doc is shorter
  * than one gram) — as a NATIVE CODEGEN'D Catalyst expression.
  *
  * This is the kernel under [[graft.dedup.SubstringDedup]]'s
  * exact-substring excision (Lee et al., "Deduplicating Training Data
  * Makes Language Models Better", ACL 2022 — the suffix-array modality's
  * distributed k-gram approximation): a position whose gram hash recurs
  * in another document witnesses a shared ≥GramLen-char span, and
  * maximal runs of such positions reconstruct the repeated substring.
  *
  * Same polynomial family as [[WinnowMins]] (base [[GramHashes.PolyBase]]
  * = 131 over decoded code points, one shared [[Utf8Codes]] decode), but
  * a 40-bit modulus instead of 2³¹−1: the winnowing pipeline only ever
  * compares fingerprints WITHIN a candidate pair, where 31 bits is ample,
  * while substring dedup promotes every corpus-wide hash collision into a
  * false excised span of real content — at ~10⁶ corpus positions a 31-bit
  * space yields hundreds of colliding position pairs, a 40-bit space ~1.
  * (At true 100 TB position counts collisions return at ANY fixed width;
  * the contract is "rare false excision", matching the probabilistic
  * variants in Lee et al. §4, not suffix-array exactness.)
  *
  * Engine computes the O(n) ROLLING recurrence; the DuckDB oracle replays
  * the O(n·K) per-term-mod direct sum ([[graft.dedup.SubstringDedup]]'s
  * CTE) — identical values because both reduce mod P exactly:
  * `h[p] = (Σ_j code[p+j]·(B^(K−1−j) mod P)) mod P`, every intermediate
  * below 2⁶²: code < 2²¹, B^e mod P < 2⁴⁰, so a term product < 2⁶¹; the
  * rolling step keeps h < P < 2⁴⁰ with h·B < 2⁴⁸.
  *
  * Registered as SQL function `gram_hashes` (self-registering via
  * [[GramHashes.gramHashes]], the [[WinnowMins.winnowMins]] pattern).
  */
case class GramHashes(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(s: Any): Any =
    GramHashes.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val obj = ctx.addReferenceObj("gramHashes", GramHashes, GramHashes.getClass.getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $obj.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object GramHashes {

  /** Gram length in characters — the MINIMUM repeated-span length the
    * substring-dedup operator detects (Lee et al. use 50 BPE tokens; 40
    * chars ≈ 8 words is the same order at the fixture's ~5-char words,
    * and sits below the fixture's shortest document).
    */
  val GramLen = 40

  /** Rolling polynomial base — shared with [[WinnowMins.PolyBase]]. */
  val PolyBase = WinnowMins.PolyBase

  /** 40-bit prime modulus (2⁴⁰ − 87): see the class scaladoc for why the
    * winnowing family's 31-bit Mersenne is not enough here.
    */
  val PolyMod = 1099511627689L

  /** B^e mod P for e = 0..GramLen-1. */
  val PolyPow: IndexedSeq[Long] =
    (0 until GramLen).scanLeft(1L)((acc, _) => acc * PolyBase % PolyMod).take(GramLen)

  // the out-rolling factor: B^(GramLen-1) mod P
  private val powTop: Long = PolyPow(GramLen - 1)

  /** One compiled pass: code points → rolling gram hashes at every
    * position. Same static-shaped single call per row as
    * [[WinnowMins.compute]] (keeps the operator inside whole-stage
    * codegen; the loop itself JITs).
    */
  def compute(s: UTF8String): ArrayData = {
    val (codes, n) = Utf8Codes.decode(s)
    val ngrams = n - (GramLen - 1)
    if (ngrams <= 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](ngrams)
    // first gram: direct per-term-mod sum (terms < 2^61; the running sum
    // adds values < 2^40, so 40 terms stay far below overflow)
    var acc = 0L
    var j = 0
    while (j < GramLen) {
      acc += codes(j) * PolyPow(GramLen - 1 - j) % PolyMod
      j += 1
    }
    out(0) = acc % PolyMod
    // rolling recurrence: h' = ((h − c_out·B^(K−1)) · B + c_in) mod P
    var k = 1
    while (k < ngrams) {
      val drop = codes(k - 1) * powTop % PolyMod
      val kept = (out(k - 1) - drop + PolyMod) % PolyMod
      out(k) = (kept * PolyBase + codes(k + GramLen - 1)) % PolyMod
      k += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  /** Registration descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("gram_hashes"),
    new ExpressionInfo(classOf[GramHashes].getName, "gram_hashes"),
    (children: Seq[Expression]) => {
      require(children.size == 1, "gram_hashes takes exactly 1 argument")
      GramHashes(children.head)
    })

  /** Column-API entry point — self-registers in the active session like
    * [[WinnowMins.winnowMins]].
    */
  def gramHashes(text: Column): Column = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = descriptor
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    call_function("gram_hashes", text)
  }
}
