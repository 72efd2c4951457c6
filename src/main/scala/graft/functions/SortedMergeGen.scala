package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext

/** Shared codegen skeleton for the two-pointer ascending-key merge that
  * both [[SortedIntersectCount]] and [[SortedIntersectDot]] compile to —
  * one copy of the loop (cursor advance, compare ladder, bounds), with the
  * per-expression accumulator plugged in. The INTERPRETED eval loops stay
  * local to each expression: sharing them would mean a per-row closure in
  * the non-codegen path, exactly the allocation these expressions exist to
  * avoid, and the codegen template is where skeleton drift would bite (it
  * is the whole-stage-codegen hot path; the interpreted path only runs
  * under `spark.sql.codegen.wholeStage=false` or constant folding).
  */
private[functions] object SortedMergeGen {

  /** Emit the merge over ArrayData variables `a` and `b` (ascending
    * distinct long keys), assigning the accumulator to `evValue`.
    *
    * @param accType  Java type of the accumulator (`"int"` / `"long"`)
    * @param accInit  initializer expression (`"0"` / `"0L"`)
    * @param accStep  statement body run at each shared key; receives the
    *                 freshly-named accumulator and the live cursor names
    *                 `(acc, i, j)` — cursors index `a` and `b` (and any
    *                 positionally-aligned side arrays) at the match
    */
  def twoPointer(
      ctx: CodegenContext,
      a: String,
      b: String,
      evValue: String,
      accType: String,
      accInit: String,
      accStep: (String, String, String) => String): String = {
    val i = ctx.freshName("i")
    val j = ctx.freshName("j")
    val acc = ctx.freshName("acc")
    val nx = ctx.freshName("nx")
    val ny = ctx.freshName("ny")
    val xv = ctx.freshName("xv")
    val yv = ctx.freshName("yv")
    s"""
       |int $nx = $a.numElements();
       |int $ny = $b.numElements();
       |int $i = 0, $j = 0;
       |$accType $acc = $accInit;
       |while ($i < $nx && $j < $ny) {
       |  long $xv = $a.getLong($i);
       |  long $yv = $b.getLong($j);
       |  if ($xv < $yv) { $i++; }
       |  else if ($xv > $yv) { $j++; }
       |  else { ${accStep(acc, i, j)}; $i++; $j++; }
       |}
       |$evValue = $acc;
     """.stripMargin
  }
}
