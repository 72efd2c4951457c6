package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-ORDER (Morton-curve) multi-dimensional data clustering — the layout
  * operator a 100 TB table needs when queries filter on MORE THAN ONE
  * column. Sorting by `l_partkey` gives perfect file-level min/max pruning
  * on partkey and NONE on suppkey; interleaving the bits of both
  * coordinates gives partial locality on BOTH — each written file covers a
  * compact rectangle-ish region of the (partkey, suppkey) grid, so a
  * min/max-pruning reader (parquet row groups, Delta/Iceberg file stats)
  * skips most files for a range predicate on EITHER dimension. This is the
  * same clustering Delta OPTIMIZE ZORDER BY and Iceberg's sort-order
  * rewrite apply; here it is a plain DataFrame transform:
  * grid-normalize → interleave → repartitionByRange → sortWithinPartitions.
  *
  * Everything is integer arithmetic on longs (grid normalization is an
  * integer multiply/divide against the one-row broadcast max), so the
  * z-value computation replays bit-exactly in DuckDB and the histogram
  * query over it is oracle-gated — the layout effect itself (per-file span
  * shrinkage vs a single-column sort) is pinned by ZOrderSpec.
  */
object ZOrder {

  /** Bits per dimension for the 2-D interleave. 16+16 → a 32-bit z-value,
    * far below the signed-long budget; 65 536 grid cells per dimension is
    * finer than any practical file count needs.
    */
  val DefaultBits = 16

  /** Bit-interleave two grid coordinates (each already in `[0, 2^bits)`)
    * into the Morton code: x occupies even bits, y odd bits. Pure
    * shift/and/or column arithmetic — whole-stage codegen keeps all
    * `2·bits` terms in one generated expression, no UDF.
    */
  def interleaveBits(x: Column, y: Column, bits: Int = DefaultBits): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    (0 until bits)
      .map { i =>
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i)
          .bitwiseOR(shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1))
      }
      .reduce(_ bitwiseOR _)
  }

  /** DuckDB spelling of [[interleaveBits]] over two SQL expressions. */
  def interleaveBitsSql(x: String, y: String, bits: Int = DefaultBits): String =
    (0 until bits)
      .map(i => s"((((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1}))")
      .mkString("(", " | ", ")")

  /** Grid-normalize a non-negative long coordinate into `[0, 2^bits)` by
    * its column max — integer-only, monotone in v, bit-exact
    * cross-engine, and OVERFLOW-FREE over the full non-negative long
    * domain, by branching on the range:
    *
    *  - small range (`max < 2^(63−bits)`): `(v << bits) / (max+1)` — the
    *    STRETCH form, spreading a narrow domain (a 0..100 suppkey) across
    *    the whole grid so both dimensions contribute high Morton bits
    *    (skipping the stretch measurably destroys 2-D locality —
    *    ZOrderSpec's span assertion catches it);
    *  - huge range (epoch-microsecond timestamps at the default 16 bits —
    *    where the stretch form's `v << bits` would wrap negative and
    *    silently destroy the layout): `v / ceil((max+1) / 2^bits)` — the
    *    SHRINK form; the domain already exceeds the grid, so no stretch
    *    is needed and the value itself is never shifted.
    *
    * Both branches are exact long arithmetic on both engines; the branch
    * predicate reads the broadcast max, so it costs one comparison per
    * row inside codegen. (A table format keeps these maxes in metadata;
    * here they come from a one-row broadcast aggregate, which is also
    * what a two-pass layout job does on first write.)
    */
  def gridCoord(v: Column, maxV: Column, bits: Int = DefaultBits): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val b = 1L << bits
    val safeMax = 1L << (63 - bits)
    val vl = v.cast("long")
    val ml = maxV.cast("long")
    // `div` = Catalyst IntegralDivide — true integer floor division on
    // longs (Column./ is DOUBLE division, which loses exactness past 2^53)
    // Shrink step: (ml div b) + 1 == ceil((max+1)/b) for ALL non-negative
    // max — algebraically identical to the former (ml + b) div b but with
    // no addition before the divide, so max > Long.MaxValue - b can't
    // overflow (Spark wrapped silently, DuckDB raised — a gate-invisible
    // engine divergence at the top edge; ADVICE r14).
    when(ml < safeMax, call_function("div", shiftleft(vl, bits), ml + lit(1L)))
      .otherwise(call_function("div", vl,
        call_function("div", ml, lit(b)) + lit(1L)))
  }

  /** SQL twin of [[gridCoord]] (DuckDB `//` is integer floor division). */
  def gridCoordSql(v: String, maxV: String, bits: Int = DefaultBits): String = {
    val b = 1L << bits
    val safeMax = 1L << (63 - bits)
    val vl = s"CAST($v AS BIGINT)"
    val ml = s"CAST($maxV AS BIGINT)"
    s"(CASE WHEN $ml < $safeMax THEN (($vl << $bits) // ($ml + 1)) " +
      s"ELSE ($vl // (($ml // $b) + 1)) END)"
  }

  /** `df` plus a `z` column: the Morton code of (`xCol`, `yCol`) after
    * grid normalization by each column's max (attached as a one-row
    * broadcast — no second scan of `df` per coordinate).
    */
  def withZValue(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = DefaultBits): DataFrame = {
    val maxes = df.agg(
      max(col(xCol)).cast("long").as("__maxx"),
      max(col(yCol)).cast("long").as("__maxy"))
    df.crossJoin(broadcast(maxes))
      .withColumn(
        "z",
        interleaveBits(
          gridCoord(col(xCol), col("__maxx"), bits),
          gridCoord(col(yCol), col("__maxy"), bits),
          bits))
      .drop("__maxx", "__maxy")
  }

  /** Re-cluster `df` into `nFiles` z-contiguous output tasks: range
    * partition on the z-value, sort within each partition. One write of
    * this layout buys every future multi-dimensional range scan its file
    * skipping — the same one-time-cost-vs-recurring-shuffle trade as
    * [[Bucketing]], aimed at PRUNING instead of join co-location.
    */
  def layoutByZ(
      df: DataFrame,
      xCol: String,
      yCol: String,
      nFiles: Int,
      bits: Int = DefaultBits): DataFrame =
    withZValue(df, xCol, yCol, bits)
      .repartitionByRange(nFiles, col("z"))
      .sortWithinPartitions(col("z"))

  /** Oracle-gated z-value exercise: per-cell row counts over the TOP
    * `2·topBits` z bits (a coarse Morton-grid density histogram — the
    * statistic a layout planner reads to size its files). Deterministic,
    * integer-only, ORDER BY cell.
    */
  def zHistogram(
      df: DataFrame,
      xCol: String,
      yCol: String,
      bits: Int = DefaultBits,
      topBits: Int = 4): DataFrame =
    withZValue(df, xCol, yCol, bits)
      .groupBy(shiftright(col("z"), 2 * (bits - topBits)).as("z_cell"))
      .agg(count(lit(1)).as("n_rows"))
      .orderBy(col("z_cell"))

  /** DuckDB oracle for [[zHistogram]] over the lineitem table keyed by
    * (l_partkey, l_suppkey).
    */
  def zHistogramLineitemOracleSql(
      bits: Int = DefaultBits,
      topBits: Int = 4): String = {
    val zx = gridCoordSql("l_partkey", "(SELECT max(l_partkey) FROM lineitem)", bits)
    val zy = gridCoordSql("l_suppkey", "(SELECT max(l_suppkey) FROM lineitem)", bits)
    val z = interleaveBitsSql(zx, zy, bits)
    s"""SELECT ($z >> ${2 * (bits - topBits)}) AS z_cell, count(*) AS n_rows
       |FROM lineitem
       |GROUP BY 1 ORDER BY 1""".stripMargin
  }
}
