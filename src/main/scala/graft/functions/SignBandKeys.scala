package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.functions.{call_function, lit, typedlit}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** All sign-LSH band keys of a quantized vector in ONE native codegen'd
  * expression: `sign_band_keys(qv, signs, numBands)` returns an
  * `array<bigint>` of `numBands` keys, where bit `i` of band `b` is set
  * iff `dot(qv, signs[b*bandBits + i]) > 0` (`bandBits = planes /
  * numBands`, exact 64-bit integer dots over the common prefix — the
  * [[DotProductQ]] contract, so the result is bit-identical to the
  * per-plane `when(dot_product_q(...) > 0, …)` spelling it replaces).
  *
  * Why an expression and not composition: the per-plane spelling unrolls
  * one 64-literal array + one dot loop PER PLANE into the projection's
  * generated consume method. The plane budget is DERIVED from the corpus
  * count ([[graft.similarity.PlaneBudget]], log₂-growth: sf0.1×8 → 32
  * planes, ×32 → 40, 100 TB → up to `MaxBits·numBands` = 80), so the
  * method grows with the population until it silently crosses HotSpot's
  * `DontCompileHugeMethods` threshold (8000 bytecodes) and the hottest
  * map stage runs INTERPRETED — measured on the ×32 scale probe as
  * 0.29 → 3.8 ms/row (13× per-row; re-running with
  * `-XX:-DontCompileHugeMethods` halved it, pinning the JIT as the
  * cause, and the remainder is the poor compilation huge methods get).
  * Here the whole sign matrix is ONE foldable `array<array<bigint>>`
  * literal materialized once into a primitive `long[][]` reference
  * object, and the emitted code is three tight nested loops (bands ×
  * bits × dims) whose size is CONSTANT in the plane count — the
  * [[IvfAssign]] cure applied to the banding stage.
  *
  * The signs argument must be FOLDABLE (plan-build metadata — the
  * md5-parity Rademacher family is computed driver-side in plain Scala)
  * and rectangular with `numBands` dividing the plane count. Null `qv` →
  * null. Registered as SQL function `sign_band_keys` through
  * [[graft.plans.GraftExtensions]].
  */
case class SignBandKeys(first: Expression, second: Expression, third: Expression)
  extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (ArrayType(LongType, _), ArrayType(ArrayType(LongType, _), _), IntegerType) =>
        // bind the foldable args ONCE — analysis rules re-run this check
        // per resolution pass, and a general foldable tree re-evals
        val tblAny = if (second.foldable) second.eval() else null
        val nbAny = if (third.foldable) third.eval() else null
        if (!second.foldable || !third.foldable)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires foldable signs and numBands arguments")
        else if (tblAny == null ||
          tblAny.asInstanceOf[ArrayData].numElements() == 0)
          TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires a non-null, non-empty sign table")
        else if (nbAny == null)
          TypeCheckResult.TypeCheckFailure(s"$prettyName numBands must not be NULL")
        else {
          val tbl = tblAny.asInstanceOf[ArrayData]
          val planes = tbl.numElements()
          val nb = nbAny.asInstanceOf[Number].intValue()
          // reject null plane rows and null elements HERE — the wildcard
          // containsNull in the type pattern admits them through analysis,
          // and the lazy `signs` materialization would NPE on an executor
          // instead (the table is plan metadata, so the scan is tiny)
          val rowNull = (0 until planes).exists(tbl.isNullAt)
          lazy val elemNull = (0 until planes).exists { i =>
            val row = tbl.getArray(i)
            (0 until row.numElements()).exists(row.isNullAt)
          }
          lazy val d0 = tbl.getArray(0).numElements()
          lazy val ragged =
            (1 until planes).exists(i => tbl.getArray(i).numElements() != d0)
          if (rowNull)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName sign table must not contain NULL plane rows")
          else if (elemNull)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName sign table must not contain NULL elements")
          else if (ragged)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName requires a rectangular sign table")
          else if (nb < 1 || nb > 64 || planes % nb != 0)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName numBands must be in [1, 64] and divide the " +
                s"plane count (got $nb bands over $planes planes)")
          else if (planes / nb > 63)
            TypeCheckResult.TypeCheckFailure(
              s"$prettyName band width ${planes / nb} exceeds 63 bits")
          else TypeCheckResult.TypeCheckSuccess
        }
      case (a, b, c) =>
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires (array<bigint>, array<array<bigint>>, int) " +
            s"inputs, got ${a.sql}, ${b.sql}, ${c.sql}")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def prettyName: String = "sign_band_keys"

  /** Sign matrix (plane-major), materialized once from the foldable literal. */
  @transient private lazy val signs: Array[Array[Long]] = {
    val arr = second.eval().asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getArray(i).toLongArray())
  }

  @transient private lazy val numBands: Int =
    third.eval().asInstanceOf[Number].intValue()

  @transient private lazy val bandBits: Int = signs.length / numBands

  @transient private lazy val dims: Int = signs(0).length

  /** Shared kernel (interpreted path): one key per band, exact integer
    * plane dots over the common prefix of `qv` and the sign rows.
    */
  private def keysOf(qv: ArrayData): ArrayData = {
    val n = math.min(qv.numElements(), dims)
    val keys = new Array[Long](numBands)
    var b = 0
    while (b < numBands) {
      var key = 0L
      var i = 0
      while (i < bandBits) {
        val s = signs(b * bandBits + i)
        var dot = 0L
        var d = 0
        while (d < n) { dot += qv.getLong(d) * s(d); d += 1 }
        if (dot > 0) key |= (1L << i)
        i += 1
      }
      keys(b) = key
      b += 1
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray(keys)
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val qv = first.eval(input)
    if (qv == null) null else keysOf(qv.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("lshSigns", signs, "long[][]")
    val qvGen = first.genCode(ctx)
    val qv = qvGen.value
    val n = ctx.freshName("n")
    val keys = ctx.freshName("keys")
    val b = ctx.freshName("b")
    val key = ctx.freshName("key")
    val i = ctx.freshName("i")
    val s = ctx.freshName("s")
    val dot = ctx.freshName("dot")
    val d = ctx.freshName("d")
    val body =
      s"""
         |boolean ${ev.isNull} = ${qvGen.isNull};
         |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} = null;
         |if (!${ev.isNull}) {
         |  int $n = java.lang.Math.min($qv.numElements(), $dims);
         |  long[] $keys = new long[$numBands];
         |  for (int $b = 0; $b < $numBands; $b++) {
         |    long $key = 0L;
         |    for (int $i = 0; $i < $bandBits; $i++) {
         |      long[] $s = $signsRef[$b * $bandBits + $i];
         |      long $dot = 0L;
         |      for (int $d = 0; $d < $n; $d++) {
         |        $dot += $qv.getLong($d) * $s[$d];
         |      }
         |      if ($dot > 0) $key |= (1L << $i);
         |    }
         |    $keys[$b] = $key;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |    .fromPrimitiveArray($keys);
         |}
       """.stripMargin
    ev.copy(code = qvGen.code + code"$body")
  }

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): Expression =
    copy(first = newFirst, second = newSecond, third = newThird)
}

object SignBandKeys {

  /** Registration descriptor for `SparkSessionExtensions.injectFunction`. */
  val descriptor: (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = (
    new FunctionIdentifier("sign_band_keys"),
    new ExpressionInfo(classOf[SignBandKeys].getName, "sign_band_keys"),
    (children: Seq[Expression]) => {
      require(children.size == 3, "sign_band_keys takes exactly 3 arguments")
      SignBandKeys(children(0), children(1), children(2))
    })

  /** Column-API entry point: the `numBands` band keys of `qv` under the
    * plane-major sign matrix (one row per plane, `planes / numBands` bits
    * per band).
    */
  def bandKeys(qv: Column, signs: IndexedSeq[IndexedSeq[Int]], numBands: Int): Column = {
    val registry = org.apache.spark.sql.SparkSession.active.sessionState.functionRegistry
    val (ident, info, builder) = descriptor
    if (!registry.functionExists(ident)) registry.registerFunction(ident, info, builder)
    call_function(
      "sign_band_keys", qv,
      typedlit(signs.map(_.map(_.toLong))), lit(numBands))
  }
}
