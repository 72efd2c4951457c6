package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Top-k rows per group by rank — the "3 biggest events per type" shape.
  *
  * Scale design (100 TB): `row_number() ≤ k` above a window triggers
  * Catalyst's `InferWindowGroupLimit` rewrite: a `WindowGroupLimit`
  * physical node keeps only k rows PER PARTITION before the shuffle, so
  * the exchange carries ≤ k·partitions rows instead of the whole table —
  * the distributed top-k one would otherwise hand-build with
  * `mapPartitions` + a bounded heap. `WindowOpsSpec` pins the rewrite's
  * presence in the physical plan so a regression (e.g. a non-rank-like
  * function sneaking in) is caught.
  *
  * Money is ranked in integer cents (`round(value·100)`), so ordering and
  * output are engine-exact; ties break on `event_id` for determinism.
  */
object GroupTopK {

  /** Top `k` events per event_type by value (cents), deterministic
    * tie-break. Output: event_type, rn (1..k), event_id, cents.
    */
  def topK(events: DataFrame, k: Int = 3): DataFrame = {
    val w = Window.partitionBy("event_type")
      .orderBy(col("cents").desc, col("event_id").asc)
    events
      .select(
        col("event_type"),
        col("event_id"),
        graft.queries.Tables.cents.as("cents"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select(col("event_type"), col("rn"), col("event_id"), col("cents"))
  }

  /** DuckDB oracle for [[topK]] (`row_number` is BIGINT there natively). */
  def topKOracleSql(k: Int = 3): String =
    s"""WITH t AS (
       |  SELECT event_type, event_id,
       |         CAST(round(value * 100) AS BIGINT) AS cents
       |  FROM events
       |),
       |r AS (
       |  SELECT event_type, event_id, cents,
       |         row_number() OVER (
       |           PARTITION BY event_type ORDER BY cents DESC, event_id) AS rn
       |  FROM t
       |)
       |SELECT event_type, rn, event_id, cents
       |FROM r WHERE rn <= $k ORDER BY event_type, rn""".stripMargin
}
