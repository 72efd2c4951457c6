package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Sessionize
import graft.queries.Tables

/** [[StreamingSessionize]] against the BATCH [[Sessionize]] operator on the
  * real sf0.001 event log, replayed in event-time order across multiple
  * micro-batches: every session the stream closes (gap-closed mid-stream or
  * timeout-flushed at the end) must be byte-identical to the batch
  * operator's row for that (user, session).
  */
class StreamingSessionizeSpec extends SparkSpec {
  import spark.implicits._

  // full-microsecond Timestamp (the millis constructor truncates micros,
  // which would shift every session boundary vs the batch operator)
  private def usToTimestamp(us: Long): Timestamp = {
    val t = new Timestamp(us / 1000000L * 1000L)
    t.setNanos((us % 1000000L).toInt * 1000)
    t
  }

  test("streamed sessions equal the batch operator across micro-batches") {
    val evs = Tables.events(spark, sf001)
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._3)
    val maxTs = evs.map(_._3).max

    val input = MemoryStream[(Long, Long, Timestamp)](spark)
    val withTs = input.toDF().toDF("user_id", "event_id", "ts")
      .withWatermark("ts", "1 second")
    val query = StreamingSessionize.sessions(spark, withTs)
      .writeStream.format("memory").queryName("sess_stream")
      .outputMode("append").start()
    try {
      // replay in event-time order, three triggers
      evs.grouped(math.max(1, evs.length / 3 + 1)).foreach { chunk =>
        input.addData(chunk.map(e => (e._1, e._2, usToTimestamp(e._3))): _*)
        query.processAllAvailable()
      }
      // two sentinel triggers on a dummy user far past every timeout: the
      // first advances the watermark (watermark updates AFTER a batch), the
      // second runs with it advanced, firing the event-time timeouts that
      // flush each user's final open session
      (1 to 2).foreach { i =>
        input.addData((-1L, -i.toLong,
          usToTimestamp(maxTs + i * 10L * Sessionize.GapUs)))
        query.processAllAvailable()
      }
      val streamed = spark.table("sess_stream")
        .filter(col("user_id") >= 0)
        .select("user_id", "session_id", "n_events", "start_us", "end_us", "dur_us")
        .as[(Long, Long, Long, Long, Long, Long)]
        .collect().sorted
      val batch = Sessionize.sessions(Tables.events(spark, sf001))
        .select("user_id", "session_id", "n_events", "start_us", "end_us", "dur_us")
        .as[(Long, Long, Long, Long, Long, Long)]
        .collect().sorted
      assert(streamed.length == batch.length,
        s"streamed ${streamed.length} sessions vs batch ${batch.length}")
      assert(streamed.toSeq == batch.toSeq)
    } finally query.stop()
  }
}
