package graft.sinks

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Partitioned parquet output — the physical table design the 100 TB tier
  * is built on, complementing the reference-parity text sink (K1).
  *
  * [[write]] lays the data out Hive-style: each partition-column value
  * becomes a directory level, so a reader's filter on that column prunes
  * WHOLE DIRECTORIES at planning time (`PartitionFilters` in the scan,
  * zero bytes read from other partitions). Combined with in-file row-group
  * stats this is the difference between scanning 100 TB and scanning the
  * one partition a query touches. ParquetSinkSpec pins the pruning in the
  * executed plan.
  */
object ParquetSink {

  /** Write `df` as parquet partitioned by `partitionCols` (coarse,
    * low-cardinality columns — date, source, language — never high-
    * cardinality ids, which would explode the directory count).
    */
  def write(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)

  /** Read a partitioned layout back (partition columns are reconstructed
    * from the directory names).
    */
  def read(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)
}
