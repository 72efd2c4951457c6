package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DETERMINISTIC mergeable quantile sketch: a base-2 log-bucketed
  * histogram with [[SubBits]] mantissa bits per octave — the
  * HdrHistogram / DDSketch construction (Masson, Rim & Lee, "DDSketch: A
  * Fast and Fully-Mergeable Quantile Sketch with Relative-Error
  * Guarantees", VLDB 2019) with the γ-log index replaced by an INTEGER
  * bit-length index, so the whole chain is exact int64 + string ops and
  * replays bit-for-bit in DuckDB.
  *
  * Why this exists beside `approx_percentile`: the t-digest-style sketch
  * is mergeable but its centroids depend on MERGE ORDER, which varies
  * with task scheduling — the one family the DuckDB gate could never
  * cover (`events_quantiles_approx` is no_oracle BY DESIGN). A
  * histogram's merge is `sum` per bucket — commutative, associative,
  * deterministic under ANY partition order — so this sketch gives the
  * same bounded-memory one-pass shape WITH a hash gate.
  *
  * Bucketing (values are non-negative int64 cents, the
  * [[graft.queries.Tables.cents]] convention):
  *  - v < 2^[[SubBits]]: its own bucket (small values exact);
  *  - else with e = bitlen(v)−1 and shift = e−SubBits:
  *    idx = (e − SubBits)·2^SubBits + (v >> shift) — monotone in v,
  *    covering [sub·2^shift, (sub+1)·2^shift), i.e. relative bucket
  *    width ≤ 2^−SubBits (6.25 % at 4 bits; the DDSketch α guarantee).
  *
  * The q-quantile estimate is the LOWER BOUND of the bucket holding the
  * rank-⌈q·n⌉ value (ranks in exact ceil-division integers), so
  * `est ≤ true ≤ est·(1 + 2^−SubBits)` — the spec pins both sides
  * against a literal sort.
  *
  * Scale shape (100 TB): one partial-agg'd groupBy to |groups|·|buckets|
  * rows (buckets ≤ 16·60 per group — bounded state, the whole point),
  * then a per-group window + final argmin over that METADATA-sized frame.
  * The corpus is touched once.
  */
object LogHistogram {

  /** Mantissa bits per octave: 16 sub-buckets, ≤ 6.25 % relative error. */
  val SubBits = 4

  private val Small = 1L << SubBits // 16

  /** Bucket index of a non-negative int64 expression — Column and SQL
    * twins (change in lockstep). `bin()` exists in both engines and
    * `length(bin(v)) − 1` is floor(log2 v) exactly (pure string length,
    * no floating log); the variable shift is the SQL `shiftright`, which
    * accepts column shifts (the Scala functions API does not).
    */
  def bucketSqlExpr(v: String): String =
    s"""CASE WHEN $v < $Small THEN $v
       |     ELSE (CAST(length(bin($v)) AS BIGINT) - 1 - $SubBits) * $Small
       |          + shiftright($v, CAST(length(bin($v)) - 1 - $SubBits AS INT))
       |END""".stripMargin

  def bucketCol(v: String): Column = expr(bucketSqlExpr(v))

  /** DuckDB twin of [[bucketSqlExpr]] (`>>` instead of `shiftright`). */
  def bucketDuckSql(v: String): String =
    s"""CASE WHEN $v < $Small THEN $v
       |     ELSE (CAST(length(bin($v)) AS BIGINT) - 1 - $SubBits) * $Small
       |          + ($v >> CAST(length(bin($v)) - 1 - $SubBits AS INTEGER))
       |END""".stripMargin

  /** Lower bound of bucket `idx` — the quantile estimate's value. For
    * idx < 2·2^SubBits the bucket IS the value; above, e = idx div 2^S + S − 1
    * and sub = idx mod 2^S + 2^S reconstruct the covered range's floor.
    */
  def lowerSqlExpr(idx: String): String =
    s"""CASE WHEN $idx < ${2 * Small} THEN $idx
       |     ELSE shiftleft(($idx % $Small) + $Small,
       |                    CAST(($idx div $Small) - 1 AS INT))
       |END""".stripMargin

  def lowerCol(idx: String): Column = expr(lowerSqlExpr(idx))

  /** DuckDB twin of [[lowerSqlExpr]]. */
  def lowerDuckSql(idx: String): String =
    s"""CASE WHEN $idx < ${2 * Small} THEN $idx
       |     ELSE (($idx % $Small) + $Small) << CAST(($idx // $Small) - 1 AS INTEGER)
       |END""".stripMargin

  /** Per-group p50/p90/p99 lower-bound estimates (cents) from the
    * sketch: (group, n, p50_est, p90_est, p99_est).
    */
  def quantiles(df: DataFrame, group: Column, value: Column): DataFrame = {
    val hist = df
      .select(group.as("grp"), value.as("__v"))
      .select(col("grp"), bucketCol("__v").as("idx"))
      .groupBy("grp", "idx")
      .agg(count(lit(1)).as("cnt"))
    val w = Window.partitionBy("grp").orderBy("idx")
      .rowsBetween(Window.unboundedPreceding, 0)
    val cum = hist
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("n", sum(col("cnt")).over(Window.partitionBy("grp")))
    def est(num: Int, den: Int): Column =
      min(when(
        col("cum") >= expr(s"(n * $num + ${den - 1}) div $den"),
        lowerCol("idx")))
    cum.groupBy(col("grp"))
      .agg(
        max(col("n")).as("n"),
        est(1, 2).as("p50_est"),
        est(9, 10).as("p90_est"),
        est(99, 100).as("p99_est"))
  }

  /** DuckDB replay of [[quantiles]]: same buckets, same cumulative ranks,
    * same lower-bound reconstruction.
    */
  def quantilesOracleSql(
      fromSql: String, groupSql: String, valueSql: String,
      groupAlias: String = "grp"): String =
    s"""WITH src AS (SELECT $groupSql AS grp, $valueSql AS v FROM $fromSql),
       |hist AS (
       |  SELECT grp, ${bucketDuckSql("v")} AS idx, CAST(count(*) AS BIGINT) AS cnt
       |  FROM src GROUP BY 1, 2),
       |cum AS (
       |  SELECT grp, idx, cnt,
       |         CAST(sum(cnt) OVER (PARTITION BY grp ORDER BY idx
       |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |         CAST(sum(cnt) OVER (PARTITION BY grp) AS BIGINT) AS n
       |  FROM hist)
       |SELECT grp AS $groupAlias, max(n) AS n,
       |       min(CASE WHEN cum >= (n * 1 + 1) // 2
       |                THEN ${lowerDuckSql("idx")} END) AS p50_est,
       |       min(CASE WHEN cum >= (n * 9 + 9) // 10
       |                THEN ${lowerDuckSql("idx")} END) AS p90_est,
       |       min(CASE WHEN cum >= (n * 99 + 99) // 100
       |                THEN ${lowerDuckSql("idx")} END) AS p99_est
       |FROM cum GROUP BY grp ORDER BY $groupAlias""".stripMargin
}
