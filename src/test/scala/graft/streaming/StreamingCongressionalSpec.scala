package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables
import graft.sampling.CongressionalSampled

/** Stream-vs-batch congressional sampling: admitting the corpus through
  * the static-rate-table form must keep exactly the batch sampler's keep
  * set, across micro-batch boundaries.
  */
class StreamingCongressionalSpec extends SparkSpec {
  import spark.implicits._

  private val K = 100

  test("streamed events keep exactly the batch congressional sample") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
      .select(col("event_id"), col("event_type"))
    val stratum = col("event_type")
    val batchKeep = CongressionalSampled
      .sample(events, stratum, col("event_id"), targetK = K)
      .collect().map(_.getAs[Long]("event_id")).toSet
    val rates = CongressionalSampled.rates(
      events.filter(stratum.isNotNull && col("event_id").isNotNull), stratum, K)

    val rows = events.collect().map(r => (r.getLong(0), r.getString(1)))
    val input = MemoryStream[(Long, String)](spark)
    val out = StreamingCongressional.sample(
      input.toDF().toDF("event_id", "event_type"),
      col("event_type"), col("event_id"), rates)
    val query = out.writeStream
      .format("memory").queryName("scong").outputMode("append").start()
    try {
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val got = spark.table("scong")
        .collect().map(_.getAs[Long]("event_id")).toSet
      assert(got === batchKeep,
        s"missing=${(batchKeep -- got).take(5)} extra=${(got -- batchKeep).take(5)}")
      assert(got.nonEmpty)
    } finally query.stop()
  }

  test("the rate table is pinned as a local relation (executed once, not per trigger)") {
    val ref = spark.range(500).select(lit("g").as("t"), col("id").as("u"))
    val rates = CongressionalSampled.rates(ref, col("t"), K)
    val input = MemoryStream[(String, Long)](spark)
    val out = StreamingCongressional.sample(
      input.toDF().toDF("t", "u"), col("t"), col("u"), rates)
    // a lazy rate frame would show the snapshot scan + aggregate in the
    // stream's plan and re-run them every micro-batch; the pinned form is
    // a LocalRelation — policy frozen at construction
    val plan = out.queryExecution.logical.toString
    assert(plan.contains("LocalRelation"), s"rate table not pinned:\n$plan")
    assert(!plan.contains("Range (0, 500"), s"snapshot scan leaked into the stream plan:\n$plan")
  }

  test("null-keyed arrivals are dropped, matching the batch pre-filter") {
    val ref = spark.range(500).select(lit("g").as("t"), col("id").as("u"))
    val rates = CongressionalSampled.rates(ref, col("t"), K)
    val input = MemoryStream[(Option[String], Option[Long])](spark)
    val out = StreamingCongressional.sample(
      input.toDF().toDF("t", "u"), col("t"), col("u"), rates)
    val query = out.writeStream
      .format("memory").queryName("scongnull").outputMode("append").start()
    try {
      input.addData((None, Some(7L)), (Some("g"), None), (Some("g"), Some(7L)))
      query.processAllAvailable()
      val got = spark.table("scongnull").collect()
      // sampled regime (n=500 > K=100, bp=2000): the fully-keyed row may
      // or may not land in g's hash band — either is fine; the two
      // null-keyed rows must NEVER appear
      assert(got.forall(r => !r.isNullAt(r.fieldIndex("u"))))
      assert(got.length <= 1)
    } finally query.stop()
  }

  test("sampleSaved keeps the batch set with NO driver materialization (parquet static side)") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
      .select(col("event_id"), col("event_type"))
    val stratum = col("event_type")
    val batchKeep = CongressionalSampled
      .sample(events, stratum, col("event_id"), targetK = K)
      .collect().map(_.getAs[Long]("event_id")).toSet
    val rates = CongressionalSampled.rates(
      events.filter(stratum.isNotNull && col("event_id").isNotNull), stratum, K)
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_scong_rates"
    StreamingCongressional.saveRates(rates, path)

    val input = MemoryStream[(Long, String)](spark)
    val out = StreamingCongressional.sampleSaved(
      input.toDF().toDF("event_id", "event_type"),
      col("event_type"), col("event_id"), path)
    // the static side must be the parquet relation itself — a driver
    // collect would pin a LocalRelation (the sample() form); this path
    // must stay distributed at any stratification cardinality
    val plan = out.queryExecution.logical.toString
    assert(!plan.contains("LocalRelation"), s"rates were driver-pinned:\n$plan")
    assert(plan.toLowerCase.contains("parquet"), s"no parquet static side:\n$plan")
    val query = out.writeStream
      .format("memory").queryName("scongsaved").outputMode("append").start()
    try {
      val rows = events.collect().map(r => (r.getLong(0), r.getString(1)))
      val (b1, b2) = rows.splitAt(rows.length / 2)
      input.addData(b1: _*)
      query.processAllAvailable()
      input.addData(b2: _*)
      query.processAllAvailable()
      val got = spark.table("scongsaved")
        .collect().map(_.getAs[Long]("event_id")).toSet
      assert(got === batchKeep,
        s"missing=${(batchKeep -- got).take(5)} extra=${(got -- batchKeep).take(5)}")
      assert(got.nonEmpty)
    } finally query.stop()
  }
}
