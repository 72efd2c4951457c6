package graft.sinks

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Bucketing
import graft.queries.Tables

/** Physical-layout specs: partition pruning and bucket-join plans — the
  * write-time decisions that decide scan and shuffle cost at 100 TB.
  */
class PhysicalLayoutSpec extends SparkSpec {

  private def executed(df: org.apache.spark.sql.DataFrame): String = {
    df.collect()
    df.queryExecution.executedPlan.toString
  }

  test("partitioned parquet: a partition filter prunes directories at plan time") {
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_part_events"
    val events = Tables.events(spark, sf001)
    ParquetSink.write(events, path, Seq("event_type"))
    val someType = events.select("event_type").head().getString(0)
    val q = ParquetSink.read(spark, path).filter(col("event_type") === someType)
    val plan = executed(q)
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("event_type"), plan.take(3000))
    // values round-trip: count matches the unpartitioned filter
    assert(q.count() === events.filter(col("event_type") === someType).count())
    // and the layout really is hive-style directories
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("event_type=")))
  }

  test("bucketed tables join WITHOUT an exchange on either side") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      Bucketing.writeBucketed(
        Tables.orders(spark, sf001).select("o_orderkey", "o_orderdate"),
        "b_orders", "o_orderkey", 8)
      Bucketing.writeBucketed(
        Tables.lineitem(spark, sf001)
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "b_lineitem", "o_orderkey", 8)
      val joined = Bucketing.bucketedJoin(spark, "b_orders", "b_lineitem", "o_orderkey")
      val plan = executed(joined)
      assert(!plan.contains("Exchange"), plan.take(3000))
      assert(plan.contains("SortMergeJoin"), plan.take(3000))
      // same join unbucketed DOES exchange — the layout is what removed it
      val unbucketed = Tables.orders(spark, sf001).select("o_orderkey", "o_orderdate")
        .join(
          Tables.lineitem(spark, sf001)
            .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
          "o_orderkey")
      assert(executed(unbucketed).contains("Exchange"))
      // and the result is the same rows
      assert(joined.count() === unbucketed.count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
    }
  }
}
