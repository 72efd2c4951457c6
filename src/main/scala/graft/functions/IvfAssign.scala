package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** IVF coarse-quantizer list assignment — `argmin_i (c_i·c_i − 2·qv·c_i)`
  * over a fixed centroid table — as a native codegen'd Catalyst
  * expression, ties to the lower centroid id.
  *
  * This replaces [[graft.similarity.IvfIndex.detTopK]]'s original
  * `least(struct(dist_i, i), …)` literal fold: that spelling embeds
  * `nlist × dims` literal NODES into the projection's expression tree,
  * fine at a fixture-sized `nlist = 16` but quadratic codegen bloat once
  * the list count is DERIVED from the corpus (`nlist ≈ √n`, the in-plan
  * sizing discipline) — exactly the upgrade the original scaladoc
  * promised. Here the whole centroid matrix is ONE foldable
  * `array<array<bigint>>` literal, materialized once per (driver, task)
  * into a primitive `long[][]` + precomputed `c·c` terms that ride into
  * generated code as reference objects; the emitted code is two tight
  * primitive loops (centroids × dims) with no per-centroid expression
  * tree. The argmin stays a PER-ROW projection, so corpus-wide list
  * assignment still shuffles nothing at any derived `nlist`.
  *
  * Semantics (replayed bit-for-bit by the DuckDB oracle's argmin QUALIFY):
  * return the smallest `i` minimizing `cc(i) − 2·Σ_j qv(j)·c_i(j)` in
  * 64-bit integer arithmetic — the squared-L2 surrogate with the
  * row-constant `qv·qv` term dropped (same order, same ties). Null `qv` →
  * null. The centroid argument must be FOLDABLE (plan-build metadata, the
  * saved-quality-model-weights pattern) and non-empty.
  *
  * Registered as SQL function `ivf_assign` through
  * [[graft.plans.GraftExtensions]].
  */
case class IvfAssign(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _)) =>
      if (!right.foldable)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable centroid table")
      else if (right.eval() == null ||
        right.eval().asInstanceOf[ArrayData].numElements() == 0)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a non-null, non-empty centroid table")
      else {
        // rectangularity: every centroid row must share one dimension —
        // a ragged table would otherwise surface only as per-row errors
        val tbl = right.eval().asInstanceOf[ArrayData]
        val d0 = tbl.getArray(0).numElements()
        val ragged = (1 until tbl.numElements())
          .exists(i => tbl.getArray(i).numElements() != d0)
        if (ragged)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a rectangular centroid table")
        else TypeCheckResult.TypeCheckSuccess
      }
    case (l, r) =>
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<bigint>, array<array<bigint>>) inputs, " +
          s"got ${l.sql} and ${r.sql}")
  }

  override def dataType: DataType = IntegerType

  override def prettyName: String = "ivf_assign"

  /** Centroid matrix, materialized once from the foldable literal. */
  @transient private lazy val cents: Array[Array[Long]] = {
    val arr = right.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      arr.getArray(i).toLongArray()
    }
  }

  /** Precomputed `c·c` per centroid. */
  @transient private lazy val cc: Array[Long] =
    cents.map(c => c.map(x => x * x).sum)

  @transient private lazy val dims: Int = cents(0).length

  /** Shared argmin kernel (interpreted path). A dimension mismatch FAILS
    * loudly: truncating to the shorter length would subtract a full-dims
    * `c·c` from a prefix dot — systematically biased toward small-norm
    * centroids, silently wrong everywhere.
    */
  private def argmin(qv: ArrayData): Int = {
    val nq = qv.numElements()
    if (nq != dims)
      throw new IllegalArgumentException(
        s"ivf_assign: query vector has $nq dims, centroids have $dims")
    var best = Long.MaxValue
    var bi = 0
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      var dot = 0L
      var j = 0
      while (j < dims) { dot += qv.getLong(j) * c(j); j += 1 }
      val d = cc(ci) - 2L * dot
      if (d < best) { best = d; bi = ci }
      ci += 1
    }
    bi
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val qv = left.eval(input)
    if (qv == null) null else argmin(qv.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("ivfCents", cents, "long[][]")
    val ccRef = ctx.addReferenceObj("ivfCc", cc, "long[]")
    val leftGen = left.genCode(ctx)
    val best = ctx.freshName("best")
    val bi = ctx.freshName("bi")
    val ci = ctx.freshName("ci")
    val c = ctx.freshName("c")
    val n = ctx.freshName("n")
    val dot = ctx.freshName("dot")
    val j = ctx.freshName("j")
    val d = ctx.freshName("d")
    val qv = leftGen.value
    val body =
      s"""
         |boolean ${ev.isNull} = ${leftGen.isNull};
         |int ${ev.value} = 0;
         |if (!${ev.isNull}) {
         |  int $n = $qv.numElements();
         |  if ($n != ${cents(0).length}) {
         |    throw new IllegalArgumentException(
         |      "ivf_assign: query vector has " + $n +
         |      " dims, centroids have ${cents(0).length}");
         |  }
         |  long $best = Long.MAX_VALUE;
         |  int $bi = 0;
         |  for (int $ci = 0; $ci < $centsRef.length; $ci++) {
         |    long[] $c = $centsRef[$ci];
         |    long $dot = 0L;
         |    for (int $j = 0; $j < $n; $j++) {
         |      $dot += $qv.getLong($j) * $c[$j];
         |    }
         |    long $d = $ccRef[$ci] - 2L * $dot;
         |    if ($d < $best) { $best = $d; $bi = $ci; }
         |  }
         |  ${ev.value} = $bi;
         |}
       """.stripMargin
    ev.copy(code = leftGen.code + code"$body")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IvfAssign {

  /** Registration descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("ivf_assign"),
    new ExpressionInfo(classOf[IvfAssign].getName, "ivf_assign"),
    (children: Seq[Expression]) => {
      require(children.size == 2, "ivf_assign takes exactly 2 arguments")
      IvfAssign(children(0), children(1))
    })

  /** Column-API entry point: argmin list id of `qv` against `cents`. */
  def assign(qv: Column, cents: Array[Array[Long]]): Column = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = descriptor
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    call_function("ivf_assign", qv, typedlit(cents.map(_.toSeq).toSeq))
  }
}
