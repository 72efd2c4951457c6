package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sampling.SamplingConfig

/** Structured Streaming specs driven through MemoryStream → memory sink:
  * the sampled windowed aggregation matches its batch twin (same seed, same
  * filter), and watermark-bounded dedup drops in-horizon duplicates.
  */
class StreamingSampledSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(3600000L + minute * 60000L)

  private def rows: Seq[(Timestamp, String)] =
    (0 until 200).map(i => (ts(i % 30), if (i % 3 == 0) "a" else "b"))

  test("sampled windowed counts: streaming result equals the batch twin, HT-scaled") {
    val input = MemoryStream[(Timestamp, String)](spark)
    val cfg = SamplingConfig(ratio = 0.5, seed = 11L)
    val out = StreamingSampled.windowedCounts(
      input.toDF().toDF("ts", "key"), "ts", "key", cfg, "10 minutes", "20 minutes")
    val query = out.writeStream
      .format("memory").queryName("wc_stream").outputMode("complete").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streaming = spark.table("wc_stream")
        .select("win_start", "key", "cnt", "est_cnt")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      // batch twin over the same data, same pipeline shape
      val batch = rows.toDF("ts", "key")
        .filter(rand(cfg.seed) < lit(0.5))
        .groupBy(window(col("ts"), "10 minutes"), col("key"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start"), col("key"), col("cnt"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
        .toMap
      // same windows/keys; counts may differ per partition layout of rand —
      // but totals must agree to HT semantics: est = cnt / p
      streaming.foreach { case (_, (cnt, est)) => assert(est === cnt / 0.5) }
      assert(streaming.keySet === batch.keySet)
      val sTotal = streaming.values.map(_._1).sum
      val bTotal = batch.values.sum
      // both are seeded Bernoulli samples of the same 200 rows at p=0.5;
      // partitioning may differ between the streaming and batch runs, so
      // assert statistical agreement, not row identity
      assert(math.abs(sTotal - bTotal) <= 40, s"stream $sTotal vs batch $bTotal")
    } finally query.stop()
  }

  test("universe-sampled windowed counts: streaming result is row-IDENTICAL " +
    "to the batch twin (deterministic keep-set, replay-safe)") {
    val input = MemoryStream[(Timestamp, String)](spark)
    // unit = the full row rendered as a string (ts millis + key): stable
    // across partitionings, replays, and engines
    def unit = concat(col("ts").cast("long"), lit("|"), col("key"))
    val out = StreamingSampled.windowedCountsUniverse(
      input.toDF().toDF("ts", "key"), "ts", "key", unit, 30, "10 minutes", "20 minutes")
    val query = out.writeStream
      .format("memory").queryName("wcu_stream").outputMode("complete").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val streaming = spark.table("wcu_stream")
        .select("win_start", "key", "cnt", "est_cnt")
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> (r.getLong(2), r.getDouble(3)))
        .toMap
      val batch = graft.sampling.UniverseSampled
        .sample(rows.toDF("ts", "key"), unit, 30)
        .groupBy(window(col("ts"), "10 minutes"), col("key"))
        .agg(count(lit(1)).as("cnt"))
        .select(col("window.start"), col("key"), col("cnt"))
        .collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2))
        .toMap
      // EXACT equality — the deterministic predicate keeps the same rows
      // regardless of partition layout (the rand(seed) twin above can only
      // assert statistical agreement)
      assert(streaming.view.mapValues(_._1).toMap === batch)
      streaming.foreach { case (_, (cnt, est)) =>
        assert(est === cnt * (100.0 / 30))
      }
      assert(streaming.nonEmpty)
    } finally query.stop()
  }

  test("exact mode (ratio 1.0): streaming counts are exact, est equals cnt") {
    val input = MemoryStream[(Timestamp, String)](spark)
    val out = StreamingSampled.windowedCounts(
      input.toDF().toDF("ts", "key"), "ts", "key", SamplingConfig.Exact,
      "10 minutes", "20 minutes")
    val query = out.writeStream
      .format("memory").queryName("wc_exact").outputMode("complete").start()
    try {
      input.addData(rows: _*)
      query.processAllAvailable()
      val got = spark.table("wc_exact").collect()
        .map(r => (r.getTimestamp(0), r.getString(1)) -> r.getLong(2)).toMap
      val expect = rows.groupBy { case (t, k) =>
        (new Timestamp(t.getTime / 600000 * 600000), k)
      }.view.mapValues(_.size.toLong).toMap
      assert(got === expect)
      assert(spark.table("wc_exact").filter(col("est_cnt") =!= col("cnt")).count() === 0)
    } finally query.stop()
  }

  test("runningAccounting: custom state accumulates (total, sampled) across triggers") {
    val input = MemoryStream[(Timestamp, String)](spark)
    val cfg = SamplingConfig(ratio = 0.5, seed = 7L)
    val out = StreamingSampled.runningAccounting(
      spark, input.toDF().toDF("ts", "key"), "key", cfg)
    val query = out.toDF().writeStream
      .format("memory").queryName("acct_stream").outputMode("update").start()
    try {
      input.addData(rows: _*) // batch 1: 200 rows
      query.processAllAvailable()
      input.addData(rows: _*) // batch 2: same 200 again
      query.processAllAvailable()
      // update mode: take the LAST emitted row per key
      val last = spark.table("acct_stream").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        .groupBy(_._1).view.mapValues(_.maxBy(_._2)).toMap
      val perKeyTotal = rows.groupBy(_._2).view.mapValues(_.size.toLong * 2).toMap
      assert(last.keySet === perKeyTotal.keySet)
      last.foreach { case (k, (_, total, sampled, rate)) =>
        assert(total === perKeyTotal(k), s"key $k total")
        assert(sampled > 0 && sampled < total, s"key $k sampled=$sampled of $total")
        assert(math.abs(rate - sampled.toDouble / total) < 1e-12)
        // seeded Bernoulli at p=0.5: the achieved rate is near the design
        assert(math.abs(rate - 0.5) < 0.2, s"key $k rate $rate")
      }
    } finally query.stop()
  }

  test("dedupWithinWatermark drops duplicate ids inside the horizon") {
    val input = MemoryStream[(Timestamp, Long)](spark)
    val out = StreamingSampled.dedupWithinWatermark(
      input.toDF().toDF("ts", "id"), "ts", Seq("id"), "30 minutes")
    val query = out.writeStream
      .format("memory").queryName("dedup_stream").outputMode("append").start()
    try {
      // 50 ids, each sent twice within the horizon
      val dups = (0 until 50).flatMap(i => Seq((ts(i % 10), i.toLong), (ts(i % 10 + 1), i.toLong)))
      input.addData(dups: _*)
      query.processAllAvailable()
      val got = spark.table("dedup_stream").select("id").collect().map(_.getLong(0))
      assert(got.length === 50)
      assert(got.toSet === (0 until 50).map(_.toLong).toSet)
    } finally query.stop()
  }
}
