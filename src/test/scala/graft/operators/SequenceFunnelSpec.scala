package graft.operators

import graft.SparkSpec
import graft.queries.Tables

class SequenceFunnelSpec extends SparkSpec {

  test("funnel matches a naive per-user ordered sweep") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val rows = events.select(
      org.apache.spark.sql.functions.col("user_id"),
      org.apache.spark.sql.functions.col("event_type"),
      org.apache.spark.sql.functions.unix_micros(org.apache.spark.sql.functions.col("ts")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = rows.groupBy(_._1)
    def earliestAfter(ts: Seq[Long], after: Long): Option[Long] = {
      val c = ts.filter(_ > after)
      if (c.isEmpty) None else Some(c.min)
    }
    var s1 = 0; var s2 = 0; var s3 = 0
    byUser.foreach { case (_, evs) =>
      val views = evs.filter(_._2 == "view").map(_._3)
      if (views.nonEmpty) {
        s1 += 1
        val t1 = views.min
        earliestAfter(evs.filter(_._2 == "click").map(_._3), t1).foreach { t2 =>
          s2 += 1
          if (earliestAfter(evs.filter(_._2 == "purchase").map(_._3), t2).isDefined) s3 += 1
        }
      }
    }
    val got = SequenceFunnel.funnel(events).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got === Map("1_view" -> s1.toLong, "2_click" -> s2.toLong, "3_purchase" -> s3.toLong))
    // funnel counts are monotone non-increasing
    assert(got("1_view") >= got("2_click") && got("2_click") >= got("3_purchase"))
    assert(got("1_view") > 0)
  }
}
