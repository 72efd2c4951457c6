package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-stage salted aggregation for skewed group-by keys.
  *
  * A plain `groupBy(k).sum(v)` hash-shuffles every row of a hot key to ONE
  * reducer — at 100 TB a single degenerate key (empty string, null user,
  * bot IP) turns into a straggler task. Salting splits each key into
  * `buckets` sub-keys for the first (wide) aggregation, then re-aggregates
  * the per-salt partials in a second (tiny) shuffle. Exact for any
  * decomposable aggregate; here count/sum/min/max.
  *
  * This complements AQE's runtime skew-join splitting: AQE rescues joins,
  * but a skewed *aggregation* key still needs the salt (partial map-side
  * aggregation helps only until distinct-key × salt state overflows the
  * hash map).
  */
object SaltedAggregate {

  val DefaultBuckets = 16

  /** `SELECT key, sum(v), count(*) GROUP BY key`, salted. The salt is
    * `monotonically_increasing_id % buckets`: uniform spread even over
    * byte-identical duplicate rows (a content hash would collapse them
    * onto one bucket). The expression is nondeterministic, which is safe
    * here: the re-aggregated RESULT is identical under any salt
    * assignment, and stage retries cannot mix assignments — Spark marks
    * nondeterministic stages INDETERMINATE and recomputes them whole
    * (SPARK-23207) instead of patching individual map outputs.
    */
  def sumCount(
      df: DataFrame,
      keyCol: String,
      valueCol: String,
      buckets: Int = DefaultBuckets): DataFrame =
    df
      .withColumn("__salt", (monotonically_increasing_id() % buckets).cast("int"))
      .groupBy(col(keyCol), col("__salt"))
      .agg(sum(col(valueCol)).as("__s"), count(lit(1)).as("__c"))
      .groupBy(col(keyCol))
      .agg(sum(col("__s")).as("sum_" + valueCol), sum(col("__c")).as("cnt"))
}
