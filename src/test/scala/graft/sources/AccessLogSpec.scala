package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{ReferenceQueries => RQ, Tables}

/** CLF string-processing specs: the synth→parse round trip, the
  * drop-don't-fail contract, P9 path extraction, and P6 prefix matching.
  */
class AccessLogSpec extends SparkSpec {
  import spark.implicits._

  test("parse recovers typed fields from a literal CLF line") {
    val df = Seq(
      """h3.example.com - - [24/Nov/2013:06:25:45 +0000] "GET /view/item7?q=3 HTTP/1.1" 200 1234""")
      .toDF("line")
    val row = AccessLog.parse(df).head()
    assert(row.getAs[String]("hostname") === "h3.example.com")
    assert(row.getAs[java.sql.Timestamp]("ts").toString === "2013-11-24 06:25:45.0")
    assert(row.getAs[String]("request") === "GET /view/item7?q=3 HTTP/1.1")
    assert(row.getAs[Int]("response") === 200)
    assert(row.getAs[Long]("bytes") === 1234L)
  }

  test("malformed lines are dropped, not failed (reference catch-all)") {
    val df = Seq(
      """h1.example.com - - [24/Nov/2013:06:25:45 +0000] "GET / HTTP/1.1" 200 10""",
      "corrupt 42",
      "",
      "also not a log line \" with a stray quote").toDF("line")
    assert(AccessLog.parse(df).count() === 1)
  }

  test("pagePath strips method, query string, and protocol (P9)") {
    val df = Seq(
      "GET /a/b?q=1 HTTP/1.1",
      "POST /plain HTTP/1.0",
      "GET /noproto").toDF("request")
    val paths = df.select(AccessLog.pagePath(col("request")).as("p")).collect().map(_.getString(0))
    assert(paths === Array("/a/b", "/plain", "/noproto"))
  }

  test("isHackPath matches exactly the 9 reference prefixes as prefixes (P6)") {
    val hits = Seq("/w00tw00t/x", "/phpMyAdmin", "/pma123", "/cgi-bin/php5/y", "/MyAdmin/z")
    val misses = Seq("/myAdmin", "/PMA", "/cgi-bin/ph", "/view/item1", "/phpmyadmin")
    val df = (hits ++ misses).toDF("path")
      .select(col("path"), AccessLog.isHackPath(col("path")).as("hit"))
      .collect()
      .map(r => r.getString(0) -> r.getBoolean(1))
      .toMap
    hits.foreach(p => assert(df(p), s"$p should match"))
    misses.foreach(p => assert(!df(p), s"$p should not match"))
  }

  test("synth→parse round trip drops exactly the corrupt lines (sf0.001)") {
    val events = Tables.events(spark, sf001)
    val total = events.count()
    val corrupt = events.filter(col("event_id") % 97 === 0).count()
    val parsed = RQ.clfParsed(events)
    assert(parsed.count() === total - corrupt)
    // every parsed hostname matches the synthesis rule
    assert(parsed.filter(!col("hostname").rlike("^h[0-9]+\\.example\\.com$")).count() === 0)
  }
}
