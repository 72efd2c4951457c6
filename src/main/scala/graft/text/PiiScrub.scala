package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PII detection and redaction — the scrub pass every training-data
  * pipeline runs before anything else. Regex-only (emails, phone-ish
  * number runs, URLs), single projection per document, scan-fused; the
  * patterns are deliberately simple and documented because the contract
  * that matters at scale is the SHAPE: one pass, counts + redacted text
  * out, no UDFs.
  */
object PiiScrub {

  val EmailRegex = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val PhoneRegex = "\\+?[0-9][0-9()\\- ]{6,}[0-9]"
  val UrlRegex = s"https?://[^${graft.dedup.Hashing.WsChars}]+"

  /** Per-doc PII counts and a fully redacted text column. Redaction order:
    * URLs, then emails, then phones (URLs and emails contain digit runs a
    * phone pattern would re-match). `n_phone` is counted on the URL- AND
    * email-redacted intermediate — the same text the phone REDACTION
    * runs on — so per-doc counts reconcile exactly with the `<PHONE>`
    * markers in `redacted` (counting on the URL-only intermediate made a
    * digit-run email count as a phone that the output never redacted).
    */
  def scrub(docs: DataFrame): DataFrame = {
    val urlEmailRedacted = regexp_replace(
      regexp_replace(col("text"), UrlRegex, "<URL>"),
      EmailRegex, "<EMAIL>")
    graft.queries.Tables.parallelismFloor(docs).select(
      col("doc_id"),
      regexp_count(col("text"), lit(EmailRegex)).cast("long").as("n_email"),
      regexp_count(col("text"), lit(UrlRegex)).cast("long").as("n_url"),
      regexp_count(urlEmailRedacted, lit(PhoneRegex))
        .cast("long").as("n_phone"),
      regexp_replace(urlEmailRedacted, PhoneRegex, "<PHONE>").as("redacted"))
  }

  /** DuckDB oracle: identical regexes, identical order. */
  val OracleSql: String =
    s"""SELECT doc_id,
       |  CAST(len(regexp_extract_all(text, '$EmailRegex')) AS BIGINT) AS n_email,
       |  CAST(len(regexp_extract_all(text, '$UrlRegex')) AS BIGINT) AS n_url,
       |  CAST(len(regexp_extract_all(
       |       regexp_replace(regexp_replace(text, '$UrlRegex', '<URL>', 'g'),
       |                      '$EmailRegex', '<EMAIL>', 'g'),
       |       '\\+?[0-9][0-9()\\- ]{6,}[0-9]')) AS BIGINT) AS n_phone,
       |  regexp_replace(regexp_replace(regexp_replace(text,
       |    '$UrlRegex', '<URL>', 'g'),
       |    '$EmailRegex', '<EMAIL>', 'g'),
       |    '\\+?[0-9][0-9()\\- ]{6,}[0-9]', '<PHONE>', 'g') AS redacted
       |FROM documents ORDER BY doc_id""".stripMargin
}
