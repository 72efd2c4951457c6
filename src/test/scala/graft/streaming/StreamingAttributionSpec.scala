package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Stream-stream attribution join: the triggered two-stream query must
  * emit exactly the batch replay's pair set, and watermark-late input
  * must be dropped (the state-cleanup contract's visible face).
  */
class StreamingAttributionSpec extends SparkSpec {
  import spark.implicits._

  private def runStreams(
      clickBatches: Seq[Seq[(Long, Long, Timestamp)]],
      purchaseBatches: Seq[Seq[(Long, Long, Timestamp)]],
      name: String): Set[(Long, Long, Long, Long)] = {
    val clicks = MemoryStream[(Long, Long, Timestamp)](spark)
    val purchases = MemoryStream[(Long, Long, Timestamp)](spark)
    val out = StreamingAttribution.pairs(
      clicks.toDF().toDF("cuser", "click_id", "click_ts"),
      purchases.toDF().toDF("user_id", "purchase_id", "purchase_ts"))
    val query = out.writeStream
      .format("memory").queryName(name).outputMode("append").start()
    try {
      clickBatches.zipAll(purchaseBatches, Seq.empty, Seq.empty).foreach {
        case (cb, pb) =>
          if (cb.nonEmpty) clicks.addData(cb: _*)
          if (pb.nonEmpty) purchases.addData(pb: _*)
          query.processAllAvailable()
      }
      spark.table(name).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSet
    } finally query.stop()
  }

  test("triggered stream-stream join emits exactly the batch pairs across micro-batches") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val expected = StreamingAttribution.pairsBatchReplay(events).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(expected.nonEmpty, "fixture yields no attribution pairs")

    def side(tpe: String): Seq[(Long, Long, Timestamp)] = events
      .filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id"), col("ts"))
      .orderBy("ts")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))

    // three time-contiguous micro-batch chunks per side: in-order arrival,
    // so the watermark never drops anything and stream must equal batch
    def chunk(s: Seq[(Long, Long, Timestamp)]): Seq[Seq[(Long, Long, Timestamp)]] = {
      val n = s.length
      Seq(s.slice(0, n / 3), s.slice(n / 3, 2 * n / 3), s.slice(2 * n / 3, n))
    }
    val got = runStreams(chunk(side("click")), chunk(side("purchase")), "attrib_eq")
    assert(got === expected,
      s"missing=${(expected -- got).take(5)} extra=${(got -- expected).take(5)}")
  }

  test("left-outer stream: unmatched purchases emit null rows once the watermark releases them") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    // batch truths on the fixture
    val organicExpected = StreamingAttribution.organic(events).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val matchedExpected = StreamingAttribution.pairsBatchReplay(events).collect()
      .map(r => (r.getLong(1), r.getLong(2))).toSet // (purchase_id, user_id)
    assert(organicExpected.nonEmpty && matchedExpected.nonEmpty)
    // outer-nulls of the batch left-outer equal the anti spelling
    val batchOuterNulls = StreamingAttribution
      .pairsLeftOuter(
        StreamingAttribution.clicksOf(events), StreamingAttribution.purchasesOf(events))
      .filter(col("click_id").isNull)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(batchOuterNulls === organicExpected)

    // triggered: feed the fixture, then one far-future sentinel pair on
    // BOTH streams to push the watermark past every real purchase — the
    // null rows must then be exactly the organic set
    def side(tpe: String) = events.filter(col("event_type") === tpe)
      .select(col("user_id"), col("event_id"), col("ts")).orderBy("ts")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getTimestamp(2)))
    val farFuture = new Timestamp(
      side("purchase").map(_._3.getTime).max + 1000L * 3600 * 1000)

    val clicks = MemoryStream[(Long, Long, Timestamp)](spark)
    val purchases = MemoryStream[(Long, Long, Timestamp)](spark)
    val out = StreamingAttribution.pairsLeftOuter(
      clicks.toDF().toDF("cuser", "click_id", "click_ts"),
      purchases.toDF().toDF("user_id", "purchase_id", "purchase_ts"))
    val query = out.writeStream
      .format("memory").queryName("attrib_outer").outputMode("append").start()
    try {
      clicks.addData(side("click"): _*)
      purchases.addData(side("purchase"): _*)
      query.processAllAvailable()
      clicks.addData((999999L, 888888L, farFuture))
      purchases.addData((999999L, 777777L, farFuture))
      query.processAllAvailable()
      // one more empty-ish trigger so the advanced watermark flushes state
      clicks.addData((999999L, 888889L, farFuture))
      query.processAllAvailable()
      val rows = spark.table("attrib_outer").collect()
      val gotNulls = rows.filter(_.isNullAt(2))
        .map(r => (r.getLong(0), r.getLong(1)))
        .filter(_._1 != 777777L) // the sentinel purchase itself
        .toSet
      val gotMatched = rows.filterNot(_.isNullAt(2))
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(gotNulls === organicExpected,
        s"missing=${(organicExpected -- gotNulls).take(5)} extra=${(gotNulls -- organicExpected).take(5)}")
      assert(gotMatched === matchedExpected)
    } finally query.stop()
  }

  test("user-atomic sampled estimator: HT identity, atomicity, and a sane estimate") {
    assumeTestdata(sf01)
    val events = Tables.events(spark, sf01)
    val truth = StreamingAttribution.pairsBatchReplay(events).count()
    val row = StreamingAttribution.pairsSampledU(events).collect().head
    val (kept, est, nUsers, keptUsers, bound) =
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3), row.getDouble(4))
    assert(est == kept * 10, "HT identity broken")
    assert(bound > 0 && bound < 1)
    // user-atomicity: every kept pair's user passed the keep predicate —
    // recompute the kept slice and check the pair set is exactly the
    // batch pairs whose user was kept
    val keptSlice = events.filter(
      graft.sampling.UniverseSampled.keep(col("user_id"), 10))
    val keptUserSet = keptSlice.select("user_id").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(keptUsers == keptUserSet.size)
    val expectedKeptPairs = StreamingAttribution.pairsBatchReplay(events)
      .collect().count(r => keptUserSet(r.getLong(2)))
    assert(kept == expectedKeptPairs,
      "sampled pair count is not the batch pairs of kept users")
    // deterministic sample — a loose truth band documents estimator use
    assert(est > 0 && nUsers > keptUsers)
    assert(math.abs(est - truth).toDouble / truth < 1.0,
      s"10% user sample estimate $est implausibly far from truth $truth")
  }

  test("input older than the watermark no longer joins (state cleanup is real)") {
    val t0 = Timestamp.valueOf("2024-03-01 10:00:00")
    def at(hours: Double): Timestamp =
      new Timestamp(t0.getTime + (hours * 3600 * 1000).toLong)

    // batch 1: one in-window pair (click 10:00, purchase 11:00)
    // batch 2: both sides jump to 40h -> global watermark ~ 39.5h
    // batch 3: a click/purchase pair back at 12:00-13:00 — far below the
    //          watermark, must be discarded as late input, no new pair
    val got = runStreams(
      clickBatches = Seq(
        Seq((1L, 100L, at(0))),
        Seq((9L, 101L, at(30))),
        Seq((1L, 102L, at(2)))),
      purchaseBatches = Seq(
        Seq((1L, 200L, at(1))),
        Seq((9L, 201L, at(30.5))),
        Seq((1L, 202L, at(3)))),
      name = "attrib_late")
    val onTime = Set(
      (100L, 200L, 1L, 3600L * 1000000L),
      (101L, 201L, 9L, 1800L * 1000000L))
    assert(got === onTime,
      s"late pair leaked or on-time pair lost: got=$got")
  }
}
