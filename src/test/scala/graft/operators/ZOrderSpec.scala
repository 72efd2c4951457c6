package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** [[ZOrder]] — the Morton-code arithmetic and, more importantly, the
  * LAYOUT CLAIM: a z-ordered file layout gives partial min/max locality on
  * BOTH clustering dimensions, where a single-column sort gives one
  * dimension everything and the other nothing.
  */
class ZOrderSpec extends SparkSpec {

  test("interleaveBits matches a reference bit-interleave on known values") {
    // 4-bit reference: x=0b1010 (even bits), y=0b0110 (odd bits)
    // z = sum_i x_i<<2i | y_i<<(2i+1)
    def ref(x: Long, y: Long, bits: Int): Long =
      (0 until bits).foldLeft(0L) { (acc, i) =>
        acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      }
    val cases = Seq((0L, 0L), (10L, 6L), (15L, 0L), (0L, 15L), (9L, 9L))
    val df = spark.createDataFrame(cases).toDF("x", "y")
    val got = df
      .select(col("x"), col("y"), ZOrder.interleaveBits(col("x"), col("y"), 4).as("z"))
      .collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2)))
      .toMap
    cases.foreach { case (x, y) =>
      assert(got((x, y)) === ref(x, y, 4), s"interleave($x,$y)")
    }
  }

  test("z-value is monotone-compatible: equal coordinates ⇒ equal z, grid-distinct ⇒ distinct") {
    val li = Tables.lineitem(spark, sf001).limit(2000)
    val z = ZOrder.withZValue(li, "l_partkey", "l_suppkey")
    // same (partkey, suppkey) must always map to the same z
    val perKey = z.groupBy("l_partkey", "l_suppkey")
      .agg(countDistinct(col("z")).as("nz"))
      .agg(max(col("nz")).as("m")).head().getLong(0)
    assert(perKey === 1L)
  }

  test("gridCoord survives epoch-microsecond magnitudes (the shrink branch)") {
    import spark.implicits._
    // v up to ~1.8e15 > 2^(63-16): the stretch form's (v << 16) would wrap
    // negative here — the shrink branch must keep coords in [0, 2^16)
    val maxV = 1800000000000000L
    val df = Seq(0L, 1L, maxV / 3, maxV / 2, maxV - 1, maxV).toDF("v")
      .withColumn("__m", lit(maxV))
      .select(col("v"), ZOrder.gridCoord(col("v"), col("__m")).as("c"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1))
    rows.foreach { case (v, c) =>
      assert(c >= 0L && c < (1L << 16), s"coord $c out of grid for v=$v")
    }
    // monotone
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq)
    // and it actually uses the grid, not just low cells
    assert(rows.last._2 > (1L << 14))
  }

  test("gridCoord at the Long top edge: max near Long.MaxValue neither overflows nor escapes the grid") {
    import spark.implicits._
    // Former shrink step (max + 2^bits) div 2^bits overflowed for
    // max > Long.MaxValue - 2^bits: Spark wrapped to a negative step
    // (garbage z-values), DuckDB raised — a gate-invisible engine
    // divergence (ADVICE r14). (max div 2^bits) + 1 is exact everywhere.
    val maxV = Long.MaxValue - 1L
    val df = Seq(0L, 1L, maxV / 2, maxV - 1, maxV).toDF("v")
      .withColumn("__m", lit(maxV))
      .select(col("v"), ZOrder.gridCoord(col("v"), col("__m")).as("c"))
    val rows = df.collect().map(r => r.getLong(0) -> r.getLong(1))
    rows.foreach { case (v, c) =>
      assert(c >= 0L && c < (1L << 16), s"coord $c out of grid for v=$v")
    }
    assert(rows.map(_._2).toSeq === rows.map(_._2).sorted.toSeq)
    assert(rows.last._2 > (1L << 14))
  }

  test("z layout bounds BOTH dimensions' per-file spans; single-column sort leaves one unbounded") {
    val dir = java.nio.file.Files.createTempDirectory("zorder_spec").toFile
    dir.deleteOnExit()
    val li = Tables.lineitem(spark, sf001)
      .select("l_partkey", "l_suppkey", "l_quantity")
    val nFiles = 16

    ZOrder.layoutByZ(li, "l_partkey", "l_suppkey", nFiles)
      .write.mode("overwrite").parquet(s"$dir/zorder")
    li.repartitionByRange(nFiles, col("l_partkey"))
      .sortWithinPartitions(col("l_partkey"))
      .write.mode("overwrite").parquet(s"$dir/bypart")

    // per-file (max-min) span of each dimension, normalized by the global
    // span — the fraction of the value range a min/max-pruning reader must
    // consider that file a candidate for
    def spans(path: String, dim: String): Seq[Double] = {
      val df = spark.read.parquet(path)
      val Array(lo, hi) = df.agg(min(col(dim)), max(col(dim))).head()
        .toSeq.map(_.asInstanceOf[Long].toDouble).toArray
      df.groupBy(input_file_name().as("f"))
        .agg((max(col(dim)) - min(col(dim))).as("span"))
        .select(col("span").cast("double"))
        .collect().map(_.getDouble(0) / math.max(hi - lo, 1.0)).toSeq
    }
    def mean(xs: Seq[Double]): Double = xs.sum / xs.size

    val zPart = mean(spans(s"$dir/zorder", "l_partkey"))
    val zSupp = mean(spans(s"$dir/zorder", "l_suppkey"))
    val pPart = mean(spans(s"$dir/bypart", "l_partkey"))
    val pSupp = mean(spans(s"$dir/bypart", "l_suppkey"))

    // the partkey-sorted layout: near-perfect partkey spans, useless
    // suppkey spans (every file covers ~the whole suppkey range)
    assert(pPart < 0.2, s"partkey-sorted partkey span $pPart")
    assert(pSupp > 0.8, s"partkey-sorted suppkey span $pSupp")
    // the z layout: BOTH dimensions materially bounded — each file covers
    // a compact grid region, so both spans sit well below the sorted
    // layout's unbounded dimension
    assert(zPart < 0.6, s"z-layout partkey span $zPart")
    assert(zSupp < 0.6, s"z-layout suppkey span $zSupp")
    assert(zSupp < pSupp / 2,
      s"z layout must at least halve the non-sorted dimension's span: $zSupp vs $pSupp")
  }
}
