package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions.{call_function, lit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** `bottom_k(x, k)` — the k smallest DISTINCT bigint values of a group,
  * as a sorted-ascending array: the KMV sketch state as a first-class
  * mergeable AGGREGATE, implemented as a custom Catalyst
  * [[TypedImperativeAggregate]] (the extension point for aggregation
  * state that is not a flat row of primitives — the same machinery
  * Spark's own `percentile`/`collect_set` use).
  *
  * WHY an imperative aggregate when the window spelling
  * ([[graft.sampling.KmvSketch]]) already gates: state discipline. The
  * window path must first DISTINCT-collapse (group, hash) — a full
  * vocabulary-sized shuffle — before the per-group top-k limit applies;
  * this aggregate holds a ≤ k-element ordered set per group in the
  * PARTIAL aggregation, so each map task ships exactly
  * `min(k, distinct-seen)` longs per group and the exchange is bounded
  * by groups × k regardless of cardinality — the textbook mergeable-
  * sketch contract (update: insert + trim; merge: set-union + trim;
  * both order-insensitive, so results are partitioning-invariant and
  * the DuckDB oracle replays them).
  *
  * State serializes as a plain long array (8 bytes/value); the
  * duplicate-dropping TreeSet IS the KMV "distinct hashes" semantics, so
  * no pre-distinct pass is needed anywhere.
  */
case class BottomKDistinct(
    child: Expression,
    kExpr: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]] {

  private lazy val k: Int = kExpr.eval().asInstanceOf[Number].intValue()

  override def children: Seq[Expression] = Seq(child, kExpr)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bottom_k"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType != LongType)
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a BIGINT input column")
    else if (!(kExpr.foldable && kExpr.dataType == IntegerType))
      TypeCheckResult.TypeCheckFailure(s"$prettyName requires a literal INT k")
    else if (kExpr.eval() == null) // CAST(NULL AS INT) is foldable; the lazy
      // k would NPE during analysis instead of failing the type check
      TypeCheckResult.TypeCheckFailure(s"$prettyName k must not be NULL")
    else if (k < 1 || k > (1 << 20))
      TypeCheckResult.TypeCheckFailure(s"$prettyName k out of range: $k")
    else TypeCheckResult.TypeCheckSuccess

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(
      buffer: java.util.TreeSet[java.lang.Long], input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    val v = child.eval(input)
    if (v != null) {
      buffer.add(v.asInstanceOf[Long])
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def merge(
      buffer: java.util.TreeSet[java.lang.Long],
      other: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    val it = other.iterator()
    while (it.hasNext) {
      buffer.add(it.next())
      if (buffer.size > k) buffer.pollLast()
    }
    buffer
  }

  override def eval(buffer: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buffer.size)
    val it = buffer.iterator() // TreeSet iterates ascending
    var i = 0
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new GenericArrayData(out)
  }

  override def serialize(buffer: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * buffer.size)
    val it = buffer.iterator()
    while (it.hasNext) bb.putLong(it.next())
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val buf = createAggregationBuffer()
    val bb = ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 8) buf.add(bb.getLong())
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(mutableAggBufferOffset = newOffset)

  override def withNewInputAggBufferOffset(newOffset: Int): BottomKDistinct =
    copy(inputAggBufferOffset = newOffset)

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren(0), kExpr = newChildren(1))
}

object BottomKDistinct {

  /** Registration descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("bottom_k"),
    new ExpressionInfo(classOf[BottomKDistinct].getName, "bottom_k"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "bottom_k takes exactly 2 arguments")
      BottomKDistinct(children(0), children(1)).toAggregateExpression()
    })

  /** Column-API entry point (the [[DotProductQ.dotq]] self-registering
    * pattern).
    */
  def bottomK(c: Column, k: Int): Column = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = descriptor
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    call_function("bottom_k", c, lit(k))
  }
}
