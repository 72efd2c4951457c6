package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, IntegerType, LongType}

/** Cross-engine deterministic BLOOM FILTER over 60-bit gram hashes — the
  * runtime-filter/semi-join compression every 100 TB decontamination and
  * anti-join pass reaches for once the probe set's exact hash set no
  * longer broadcasts comfortably (Spark's own `InjectRuntimeFilter` builds
  * the same shape with `BloomFilterAggregate`; that machinery is internal
  * and its XXH64 bits are not replayable by an external engine, so this is
  * the ORACLE-GATED twin built from the md5 hash family).
  *
  * Layout: `m = 2^mLog` bits as `m/64` longs. Positions come from classic
  * double hashing (Kirsch–Mitzenmacher: two base hashes simulate any j)
  * over the input's 60 bits — `h1 = g mod 2^30`, `h2 = 2·(g div 2^30) + 1`
  * (odd, so the stride walks all residues of the power-of-two table),
  * `p_i = (h1 + i·h2) mod m` for `i < j`. Pure nonneg integer arithmetic,
  * replayed verbatim in SQL as
  * `(g % 2^30 + i * (2*(g // 2^30) + 1)) % m`.
  *
  * [[BloomAgg]] (`bloom_agg(g, mLog, j)`) builds the bits as a mergeable
  * aggregate: update sets j bits, merge ORs two tables — each map task
  * ships exactly `m/8` bytes regardless of input cardinality (the
  * mergeable-sketch contract, like [[BottomKDistinct]]), and the ONE
  * `m/8`-byte result row is legitimate driver metadata (the
  * centroid/weight-table pattern) to embed as a literal.
  * [[BloomMightContain]] (`bloom_might_contain(g, bits, j)`) probes a
  * FOLDABLE bits literal with a tight codegen'd loop — the long[] is
  * materialized once per task as a reference object, never per row.
  */
case class BloomAgg(
    child: Expression,
    mLogExpr: Expression,
    jExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private lazy val mLog: Int = mLogExpr.eval().asInstanceOf[Number].intValue()
  private lazy val j: Int = jExpr.eval().asInstanceOf[Number].intValue()
  private lazy val mask: Long = (1L << mLog) - 1L

  override def children: Seq[Expression] = Seq(child, mLogExpr, jExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bloom_agg"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT input column")
    else if (!(mLogExpr.foldable && mLogExpr.dataType == IntegerType &&
      jExpr.foldable && jExpr.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires literal INT mLog and j")
    else if (mLogExpr.eval() == null || jExpr.eval() == null)
      TypeCheckResult.TypeCheckFailure(s"$prettyName mLog/j must not be NULL")
    else if (mLog < 6 || mLog > 30)
      TypeCheckResult.TypeCheckFailure(s"$prettyName mLog out of range: $mLog")
    else if (j < 1 || j > 16)
      TypeCheckResult.TypeCheckFailure(s"$prettyName j out of range: $j")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): Array[Long] = new Array[Long](1 << (mLog - 6))

  override def update(buffer: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val g = v.asInstanceOf[Long]
      val h1 = g & ((1L << 30) - 1L)
      val h2 = 2L * (g >>> 30) + 1L
      var i = 0
      while (i < j) {
        val p = (h1 + i * h2) & mask
        buffer((p >>> 6).toInt) |= (1L << (p & 63L))
        i += 1
      }
    }
    buffer
  }

  override def merge(buffer: Array[Long], other: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buffer.length) { buffer(i) |= other(i); i += 1 }
    buffer
  }

  override def eval(buffer: Array[Long]): Any = new GenericArrayData(buffer)

  override def serialize(buffer: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.length)
    var i = 0
    while (i < buffer.length) { bb.putLong(buffer(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BloomAgg =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BloomAgg =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), mLogExpr = newChildren(1), jExpr = newChildren(2))
}

/** `bloom_might_contain(g, bits, j)` — true iff all `j` double-hash
  * positions of `g` are set in the FOLDABLE bit table (whose length fixes
  * `m`). The bits travel as a BINARY literal — big-endian longs, the
  * [[BloomAgg.serialize]] layout — because Catalyst stores a byte-array
  * literal UNBOXED: a `typedlit(Seq[Long])` spelling would box all `m/64`
  * longs in the driver's expression tree (~25× the table's size in object
  * headers at the 2^30-bit cap), defeating the operator's own compression
  * story. The primitive `long[]` is materialized once per expression
  * instance, never per row. See [[BloomAgg]] for the position scheme.
  */
case class BloomMightContain(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (LongType, BinaryType, IntegerType) =>
        if (!(second.foldable && third.foldable))
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires foldable bits and j")
        else if (second.eval() == null || third.eval() == null)
          TypeCheckResult.TypeCheckFailure(s"$prettyName bits/j must not be NULL")
        else if (second.eval().asInstanceOf[Array[Byte]].length % 8 != 0 ||
          bits.isEmpty || java.lang.Long.bitCount(bits.length.toLong) != 1)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName bits must hold a power-of-two count of longs, " +
              s"got ${second.eval().asInstanceOf[Array[Byte]].length} bytes")
        else if (j < 1 || j > 16)
          TypeCheckResult.TypeCheckFailure(s"$prettyName j out of range: $j")
        else TypeCheckResult.TypeCheckSuccess
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (bigint, binary, int), got ${a.sql}, ${b.sql}, ${c.sql}")
    }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val bits: Array[Long] = {
    val bytes = second.eval().asInstanceOf[Array[Byte]]
    val bb = ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong(); i += 1 }
    out
  }

  @transient private lazy val j: Int = third.eval().asInstanceOf[Number].intValue()

  @transient private lazy val mask: Long = bits.length.toLong * 64L - 1L

  private def probe(g: Long): Boolean = {
    val h1 = g & ((1L << 30) - 1L)
    val h2 = 2L * (g >>> 30) + 1L
    var i = 0
    while (i < j) {
      val p = (h1 + i * h2) & mask
      if ((bits((p >>> 6).toInt) & (1L << (p & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  override def eval(input: InternalRow): Any = {
    val g = first.eval(input)
    if (g == null) null else probe(g.asInstanceOf[Long])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val bitsRef = ctx.addReferenceObj("bloomBits", bits, "long[]")
    val leftGen = first.genCode(ctx)
    val g = ctx.freshName("g")
    val h1 = ctx.freshName("h1")
    val h2 = ctx.freshName("h2")
    val i = ctx.freshName("i")
    val p = ctx.freshName("p")
    val hit = ctx.freshName("hit")
    val body =
      s"""
         |boolean ${ev.isNull} = ${leftGen.isNull};
         |boolean ${ev.value} = false;
         |if (!${ev.isNull}) {
         |  long $g = ${leftGen.value};
         |  long $h1 = $g & ((1L << 30) - 1L);
         |  long $h2 = 2L * ($g >>> 30) + 1L;
         |  boolean $hit = true;
         |  for (int $i = 0; $i < $j; $i++) {
         |    long $p = ($h1 + $i * $h2) & ${mask}L;
         |    if (($bitsRef[(int)($p >>> 6)] & (1L << ($p & 63L))) == 0L) {
         |      $hit = false; break;
         |    }
         |  }
         |  ${ev.value} = $hit;
         |}
       """.stripMargin
    ev.copy(code = leftGen.code + code"$body")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** The FIELD-CARRYING probe twin of [[BloomMightContain]] — same bit
  * layout, same Kirsch–Mitzenmacher probes, but the table rides as a
  * plain constructor field instead of a binary literal child. This is
  * what the Column API builds: the literal form's plan renderings
  * re-hex the whole table per execution (the [[BloomCutPositions]]
  * pathology — ~180 s CPU at a 2 MB table, and [[graft.text
  * .Decontaminate.mLogFor]] legitimately grows tables to 2^30 bits =
  * 128 MB at web-scale gram counts, where a literal would be fatal).
  * [[BloomMightContain]] stays registered for the plain-SQL surface,
  * where tables arrive as expressions and stay decontamination-sized.
  */
case class BloomMightContainRef(
    child: Expression,
    bitsArr: Array[Long],
    probes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType =>
      if (bitsArr == null || bitsArr.isEmpty ||
        java.lang.Long.bitCount(bitsArr.length.toLong) != 1)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName bits must hold a power-of-two count of longs")
      else if (probes < 1 || probes > 16)
        TypeCheckResult.TypeCheckFailure(s"$prettyName j out of range: $probes")
      else TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires bigint, got ${t.sql}")
  }

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def prettyName: String = "bloom_might_contain_ref"

  def probe(g: Long): Boolean = {
    val bits = bitsArr
    val mask = bits.length.toLong * 64L - 1L
    val h1 = g & ((1L << 30) - 1L)
    val h2 = 2L * (g >>> 30) + 1L
    var i = 0
    while (i < probes) {
      val p = (h1 + i * h2) & mask
      if ((bits((p >>> 6).toInt) & (1L << (p & 63L))) == 0L) return false
      i += 1
    }
    true
  }

  override protected def nullSafeEval(g: Any): Any = probe(g.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomRef", this, classOf[BloomMightContainRef].getName)
    nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $self.probe($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** `bloom_cut_positions(hs)` — the 1-based positions i+1 of the hash
  * array `hs` whose element probes POSITIVE in the bit table, as ONE
  * compiled pass. Exists because the composable spelling —
  * `filter(transform(hs, (h, i) -> IF(bloom_might_contain(h, …), i+1,
  * -1)), …)` — walks two interpreted higher-order lambdas per element and
  * measured 85 s CPU where this expression costs 4 s (r16
  * `docs_substring_stream_replay` bisect); a streaming-legal per-row
  * operator cannot fall back to explode+join, so the probe loop must
  * compile.
  *
  * The bit table rides as a PLAIN CONSTRUCTOR FIELD, not a child
  * literal: a 2 MB BINARY literal measured ~180 s CPU per bench entry —
  * jstack-attributed NOT to the probe loop but to the DRIVER re-rendering
  * the formatted plan description on every execution
  * (`ExplainUtils.processPlanSkippingSubqueries` → `stripMargin` over the
  * literal's 4 MB hex). As a field it renders as an opaque array
  * reference, ships once per task as a codegen reference object, and the
  * expression tree stays flat. ([[BloomMightContain]] keeps its literal
  * child — its tables are the ≤128 KB decontamination blooms, and the
  * literal is what the SQL-function registry form requires.) Same bit
  * layout, same Kirsch–Mitzenmacher probes as [[BloomMightContain]].
  */
case class BloomCutPositions(
    child: Expression,
    bitsArr: Array[Long],
    probes: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) =>
      if (bitsArr == null || bitsArr.isEmpty ||
        java.lang.Long.bitCount(bitsArr.length.toLong) != 1)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName bits must hold a power-of-two count of longs")
      else if (probes < 1 || probes > 16)
        TypeCheckResult.TypeCheckFailure(s"$prettyName j out of range: $probes")
      else TypeCheckResult.TypeCheckSuccess
    case t =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<bigint>, got ${t.sql}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "bloom_cut_positions"

  /** One compiled pass — called from both the interpreted eval and the
    * generated code (the [[graft.functions.GramHashes]] static-call
    * shape, keeping the operator inside whole-stage codegen).
    */
  def compute(hs: org.apache.spark.sql.catalyst.util.ArrayData): Any = {
    val bits = bitsArr
    val n = hs.numElements()
    val mask = bits.length.toLong * 64L - 1L
    val out = new Array[Long](n)
    var k = 0
    var i = 0
    while (i < n) {
      val g = hs.getLong(i)
      val h1 = g & ((1L << 30) - 1L)
      val h2 = 2L * (g >>> 30) + 1L
      var q = 0
      var hit = true
      while (hit && q < probes) {
        val p = (h1 + q * h2) & mask
        if ((bits((p >>> 6).toInt) & (1L << (p & 63L))) == 0L) hit = false
        q += 1
      }
      if (hit) { out(k) = (i + 1).toLong; k += 1 }
      i += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }

  override protected def nullSafeEval(hs: Any): Any =
    compute(hs.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val self = ctx.addReferenceObj("bloomCut", this, classOf[BloomCutPositions].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $self.compute($c);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomFilter {

  /** Registration descriptors for `SparkSessionExtensions.injectFunction`. */
  val aggDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("bloom_agg"),
    new ExpressionInfo(classOf[BloomAgg].getName, "bloom_agg"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "bloom_agg takes exactly 3 arguments")
      BloomAgg(children(0), children(1), children(2)).toAggregateExpression()
    })

  val containDescriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("bloom_might_contain"),
    new ExpressionInfo(classOf[BloomMightContain].getName, "bloom_might_contain"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "bloom_might_contain takes exactly 3 arguments")
      BloomMightContain(children(0), children(1), children(2))
    })

  private def ensure(
      d: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)): Unit = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = d
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
  }

  /** Column-API: build the `2^mLog`-bit table over a BIGINT hash column. */
  def bloomAgg(g: Column, mLog: Int, j: Int): Column = {
    ensure(aggDescriptor)
    call_function("bloom_agg", g, lit(mLog), lit(j))
  }

  /** Column-API: probe a driver-built bit table (shipped as one compact
    * binary literal — see [[BloomMightContain]]).
    */
  def mightContain(g: Column, bits: Array[Long], j: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomMightContainRef(
        org.apache.spark.sql.GraftColumnBridge.expression(g), bits, j))

  /** Column-API: the compiled probe-all-positions pass over a BIGINT hash
    * array (see [[BloomCutPositions]] for why this is neither a HOF nor a
    * registry function with a literal child).
    */
  def cutPositions(hs: Column, bits: Array[Long], j: Int): Column =
    org.apache.spark.sql.GraftColumnBridge.column(
      BloomCutPositions(
        org.apache.spark.sql.GraftColumnBridge.expression(hs), bits, j))
}
