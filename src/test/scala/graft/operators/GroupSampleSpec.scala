package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class GroupSampleSpec extends SparkSpec {

  private lazy val events = Tables.events(spark, sf001)

  test("exactly k per group, ranks 1..k, deterministic across partitionings") {
    val out = GroupSample.examples(
      events, col("event_type"), col("event_id"), 3, Seq("event_id", "user_id"))
    val rows = out.collect()
    rows.groupBy(_.getString(0)).foreach { case (g, rs) =>
      assert(rs.map(_.getLong(3)).sorted.sameElements(1L to rs.length),
        s"group $g ranks not 1..k")
      assert(rs.length <= 3)
    }
    val again = GroupSample.examples(
      events.repartition(11), col("event_type"), col("event_id"), 3,
      Seq("event_id", "user_id")).collect()
    assert(rows.toSeq === again.toSeq)
  }

  test("selected examples are the hash-smallest units of each group") {
    val k = 2
    val out = GroupSample.examples(
      events, col("event_type"), col("event_id"), k, Seq("event_id"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    // driver-side recompute of the salted-hash bottom-k
    def hash60(s: String): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    val expect = events.select("event_type", "event_id").collect()
      .map(r => (r.getString(0), r.getLong(1)))
      .groupBy(_._1)
      .toSeq
      .flatMap { case (g, rs) =>
        rs.distinct.sortBy { case (_, id) => (hash60(s"gs:$id"), id.toString) }
          .take(k).map { case (_, id) => (g, id) }
      }.toSet
    assert(out === expect)
  }

  test("plan: per-group limit runs pre-shuffle") {
    val plan = GroupSample.examples(
      events, col("event_type"), col("event_id"), 3, Seq("event_id"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }
}
