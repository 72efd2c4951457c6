package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffled physical layout for exchange-free joins.
  *
  * A big-fact ⋈ big-fact equi-join normally shuffles BOTH sides on the key
  * every time it runs. Writing each side `bucketBy(n, key)` hash-
  * partitions the files ONCE at write time; every later join on that key
  * reads co-located buckets and the plan contains NO Exchange — at 100 TB
  * that converts the dominant recurring shuffle into a one-time layout
  * cost. This is the batch twin of the streaming state-store layout and
  * the standard companion to AQE (which can only optimize the shuffles
  * that still exist).
  *
  * Bucketed tables must live in the session catalog (bucket metadata has
  * no directory encoding), hence `saveAsTable`, not `parquet(path)`.
  * BucketingSpec pins the exchange-free join plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Join two same-bucketed tables on their bucket key — no exchange. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
