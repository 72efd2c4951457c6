package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Interval (range) join: match each fact row's point value to the
  * interval(s) `[lo, hi)` containing it — the IP-to-geolocation /
  * price-to-tier / timestamp-to-window join.
  *
  * Spark has no range-join operator: `f.v >= i.lo AND f.v < i.hi` plans as
  * a BroadcastNestedLoopJoin — O(|facts|·|intervals|) predicate
  * evaluations, the classic silent scale-killer. The standard fix used
  * here is BUCKET EXPANSION: pick a bucket width, explode each interval
  * into the buckets it overlaps (`floor(lo/w) .. floor((hi-1)/w)` — a few
  * rows per interval when w is near the median interval width), compute
  * each fact's single bucket `floor(v/w)`, EQUI-join on the bucket, and
  * re-check the exact predicate. The nested loop becomes a hash join: each
  * fact row meets only the intervals sharing its bucket. Overlapping
  * intervals are supported (a fact matches each container).
  *
  * Scale: the expanded interval table is |intervals| · avg-span/w rows —
  * broadcast it when small (this path; plan-pinned as BroadcastHashJoin by
  * RangeJoinSpec), shuffle both sides on the bucket when not. Either way
  * the cost is linear-ish in facts, never |facts|·|intervals|.
  */
object RangeJoin {

  /** Equi-join `facts` to `intervals` on containment `lo <= v < hi`.
    *
    * @param facts     fact table with a long point column `vCol`
    * @param intervals interval table with long `lo`/`hi` columns ([lo,hi))
    * @param width     bucket width (≈ median interval span is a good pick)
    */
  def joinByRange(
      facts: DataFrame,
      vCol: String,
      intervals: DataFrame,
      width: Long): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val expanded = intervals
      .withColumn("__bucket",
        explode(sequence(
          (col("lo") / width).cast("long"),
          ((col("hi") - 1) / width).cast("long"))))
    facts
      .withColumn("__bucket", (col(vCol) / width).cast("long"))
      .join(broadcast(expanded), Seq("__bucket"))
      .filter(col(vCol) >= col("lo") && col(vCol) < col("hi"))
      .drop("__bucket")
  }

  /** Irregular (non-uniform, so a CASE ladder can't fake the join) price
    * tiers over the events `value` domain in integer cents. The last tier
    * is wide open so every event lands somewhere.
    */
  val Tiers: Seq[(String, Long, Long)] = Seq(
    ("t00_free", 0L, 100L),
    ("t01_micro", 100L, 350L),
    ("t02_small", 350L, 900L),
    ("t03_light", 900L, 1750L),
    ("t04_mid", 1750L, 2600L),
    ("t05_heavy", 2600L, 4100L),
    ("t06_big", 4100L, 6300L),
    ("t07_larger", 6300L, 9800L),
    ("t08_huge", 9800L, 15500L),
    ("t09_top", 15500L, 100000L))

  /** Declared query: events banded into [[Tiers]] by cents, rolled up per
    * tier. Output: tier, cnt, sum_cents.
    */
  def eventsByTier(spark: SparkSession, events: DataFrame, width: Long = 1000L): DataFrame = {
    import spark.implicits._
    val tiers = Tiers.toDF("tier", "lo", "hi")
    val facts = events.select(graft.queries.Tables.cents.as("cents"))
    joinByRange(facts, "cents", tiers, width)
      .groupBy("tier")
      .agg(count(lit(1)).as("cnt"), sum(col("cents")).as("sum_cents"))
  }

  /** DuckDB oracle for [[eventsByTier]] — the honest range join the bucket
    * expansion must reproduce exactly.
    */
  def eventsByTierOracleSql: String = {
    val tierRows = Tiers.map { case (t, lo, hi) => s"('$t', $lo, $hi)" }.mkString(", ")
    s"""WITH tiers(tier, lo, hi) AS (VALUES $tierRows),
       |f AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events)
       |SELECT tier, count(*) AS cnt, CAST(sum(cents) AS BIGINT) AS sum_cents
       |FROM f JOIN tiers ON f.cents >= tiers.lo AND f.cents < tiers.hi
       |GROUP BY tier ORDER BY tier""".stripMargin
  }
}
