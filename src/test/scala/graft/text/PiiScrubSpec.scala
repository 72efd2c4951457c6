package graft.text

import graft.SparkSpec

class PiiScrubSpec extends SparkSpec {
  import spark.implicits._

  test("detects and redacts emails, phones, URLs in one pass") {
    val doc = Seq(
      (1L, "mail me at jane.doe+x@example.co.uk or call +1 (555) 123-4567, see https://ex.com/a?b=1 now"))
      .toDF("doc_id", "text")
    val r = PiiScrub.scrub(doc).head()
    assert(r.getAs[Long]("n_email") === 1L)
    assert(r.getAs[Long]("n_phone") === 1L)
    assert(r.getAs[Long]("n_url") === 1L)
    val red = r.getAs[String]("redacted")
    assert(red.contains("<EMAIL>") && red.contains("<PHONE>") && red.contains("<URL>"))
    assert(!red.contains("example.co.uk") && !red.contains("555") && !red.contains("ex.com"))
  }

  test("clean text passes through untouched") {
    val doc = Seq((1L, "nothing sensitive here at all")).toDF("doc_id", "text")
    val r = PiiScrub.scrub(doc).head()
    assert(r.getAs[Long]("n_email") === 0L)
    assert(r.getAs[Long]("n_phone") === 0L)
    assert(r.getAs[Long]("n_url") === 0L)
    assert(r.getAs[String]("redacted") === "nothing sensitive here at all")
  }

  test("URL digits are not double-counted as phone numbers (redaction order)") {
    val doc = Seq((1L, "see https://site.com/12345678901 today")).toDF("doc_id", "text")
    val r = PiiScrub.scrub(doc).head()
    assert(r.getAs[Long]("n_url") === 1L)
    assert(r.getAs[Long]("n_phone") === 0L)
  }
}
