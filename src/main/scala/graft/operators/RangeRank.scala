package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed dense global ranking: append a 1-based `pos` column giving
  * each row's position in the total order of `sortCols` — WITHOUT a
  * single-task sort or an unpartitioned window.
  *
  * Mechanics (the [[graft.text.GlobalShuffle]] discipline, generalized to
  * any sort key): `repartitionByRange` on the keys yields non-overlapping
  * sorted ranges in partition-id order; a row's global position is its
  * row_number WITHIN its range partition plus the total row count of all
  * earlier partitions. The per-partition counts are a
  * `numShufflePartitions`-row metadata aggregate (its unpartitioned prefix
  * window runs over partition COUNTS, never data) broadcast back onto the
  * data. The range shuffle is `localCheckpoint`ed because its sampled
  * boundaries must be observed identically by the count pass and the
  * ordinal pass — a correctness requirement, not a perf knob.
  *
  * Requires `sortCols` to be a total order (append a tie-breaker id column
  * if the leading keys can tie) — otherwise `pos` is still a valid ranking
  * but not deterministic across runs.
  */
object RangeRank {

  def withPos(df: DataFrame, sortCols: Seq[String]): DataFrame = {
    val parts = df.sparkSession.sessionState.conf.numShufflePartitions
    val cols: Seq[Column] = sortCols.map(col)
    val ranged = df
      .repartitionByRange(parts, cols: _*)
      .withColumn("__pid", spark_partition_id())
      .localCheckpoint(false)
    val offsets = ranged.groupBy("__pid").agg(count(lit(1)).as("__n"))
      // row_number() is 32-bit: a range partition holding > 2^31-1 rows
      // would wrap __rn silently (partition count is capped by the conf,
      // so at extreme scale per-partition rows grow unbounded) — fail
      // loudly from the already-computed per-partition counts instead of
      // emitting wrong positions; the fix at that scale is more range
      // partitions, not a bigger window
      .withColumn("__n",
        when(col("__n") > Int.MaxValue.toLong,
          raise_error(concat(
            lit(s"RangeRank.withPos: a range partition exceeds ${Int.MaxValue} rows "),
            lit("(row_number would wrap); raise spark.sql.shuffle.partitions"))))
          .otherwise(col("__n")))
      .withColumn("__off",
        coalesce(
          sum(col("__n")).over(
            Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .select("__pid", "__off")
    val inPart = Window.partitionBy("__pid").orderBy(cols: _*)
    ranged
      .withColumn("__rn", row_number().over(inPart))
      .join(broadcast(offsets), Seq("__pid"))
      .withColumn("pos", col("__off") + col("__rn"))
      .drop("__pid", "__rn", "__off")
  }
}
