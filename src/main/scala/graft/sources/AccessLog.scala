package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Apache access-log ingestion: the reference's Common-Log-Format string
  * processing, for real (operator P5, RandomizedApacheLogAnalysis.java:34-47,
  * plus P6 `hack` prefix matching :56-75 and P9 path extraction :97-107).
  *
  * The driver corpus has no raw log file, so [[synthesize]] renders a
  * deterministic CLF line per `events` row — hostnames, bracketed datetimes,
  * quoted requests with query strings, attack-probe paths, and a sprinkle of
  * malformed lines — and [[parse]] recovers typed columns from the raw
  * string with `regexp_extract`, silently dropping malformed lines exactly
  * like the reference's catch-all (RandomizedApacheLogAnalysis.java:113-115).
  * Queries then run on parse(synthesize(events)), so the extraction logic is
  * what the oracle actually checks.
  *
  * Everything is pure codegen'd built-ins: one regex pass per line at scan
  * time, no UDFs — at 100 TB the parse fuses into the scan's
  * whole-stage-codegen loop and filters/pruning push below it.
  */
object AccessLog {

  /** The reference's 9 attack-probe path prefixes, verbatim
    * (RandomizedApacheLogAnalysis.java:58-66).
    */
  val HackPrefixes: Seq[String] = Seq(
    "/w00tw00t", "/phpMyAdmin", "/pma", "/myadmin", "/MyAdmin",
    "/phpTest", "/cgi-bin/php", "/cgi-bin/php5", "/cgi-bin/php-cgi")

  /** CLF line pattern: host ident authuser [datetime] "request" status bytes. */
  val ClfRegex: String =
    """^(\S+) (\S+) (\S+) \[([^\]]+)\] "([^"]*)" (\d{3}) (\d+)$"""

  /** Deterministic request path for an events row: every 20th event is an
    * attack probe drawn from [[HackPrefixes]]; every 3rd path carries a
    * query string (exercises the `?`-stripping in P9).
    */
  private def pathExpr: Column = {
    val id = col("event_id")
    val hackPath = concat(
      element_at(array(HackPrefixes.map(lit): _*), (id % 9 + 1).cast("int")),
      lit("/x"))
    val normalPath = concat(
      lit("/"), col("event_type"), lit("/item"), (id % 50).cast("string"))
    val query = when(id % 3 === 0, concat(lit("?q="), col("user_id").cast("string")))
      .otherwise(lit(""))
    concat(when(id % 20 === 0, hackPath).otherwise(normalPath), query)
  }

  /** Render one raw CLF line per events row (single `line` string column —
    * the same shape as `spark.read.text` over a real access log). Every
    * 97th line is deliberately corrupt, to exercise the parser's
    * drop-don't-fail contract.
    */
  def synthesize(events: DataFrame, carry: Seq[String] = Nil): DataFrame = {
    val host = concat(lit("h"), col("user_id").cast("string"), lit(".example.com"))
    val datetime = concat(date_format(col("ts"), "dd/MMM/yyyy:HH:mm:ss"), lit(" +0000"))
    val request = concat(lit("GET "), pathExpr, lit(" HTTP/1.1"))
    val status = when(col("event_id") % 10 === 0, lit("404")).otherwise(lit("200"))
    val bytes = round(col("value") * 100).cast("long").cast("string")
    val good = concat(
      host, lit(" - - ["), datetime, lit("] \""), request, lit("\" "), status, lit(" "), bytes)
    // the synthesize→parse chain is the heaviest per-row string work in the
    // engine; floor its parallelism at entry (see Tables.parallelismFloor)
    graft.queries.Tables.parallelismFloor(events).select(
      when(col("event_id") % 97 === 0,
        concat(lit("corrupt "), col("event_id").cast("string")))
        .otherwise(good)
        .as("line") +: carry.map(col): _*)
  }

  /** P5: positional CLF field extraction. Lines that don't match the format
    * yield an empty group array → dropped (the reference swallows its parse
    * exceptions and moves on, RandomizedApacheLogAnalysis.java:113-115).
    *
    * The extracted group array goes through an explode-of-one barrier: a
    * Generator that Catalyst will not collapse into downstream
    * projections/filters. Without it, predicate pushdown substitutes the
    * raw-line expression back into every consumer — and because the
    * upstream line can sit inside CASE WHEN branches, codegen's
    * subexpression elimination cannot hoist the duplicates, so each of the
    * ~11 field references re-runs line synthesis + regex match per row
    * (measured 6 s vs 0.8 s at sf0.1). With the barrier the extraction
    * runs once per row and consumers see plain attributes.
    */
  def parse(lines: DataFrame, carry: Seq[String] = Nil): DataFrame =
    lines
      .select(
        // ONE anchored-regex match per line via the regex_groups kernel
        // (r18, guide §1.2 per-task work): the previous five independent
        // regexp_extract calls each re-ran the full CLF regex — 5 matches
        // per line across the whole log family. A malformed line yields
        // an EMPTY array (the old spelling's empty group-1 extract), so
        // the matched filter is size = 5.
        explode(array(graft.functions.RegexGroups.regexGroups(
          col("line"), ClfRegex, Seq(1, 4, 5, 6, 7)))).as("r")
          +: carry.map(col): _*)
      .filter(size(col("r")) === 5)
      .select(
        Seq(
          col("r").getItem(0).as("hostname"),
          to_timestamp(col("r").getItem(1), "dd/MMM/yyyy:HH:mm:ss Z").as("ts"),
          col("r").getItem(2).as("request"),
          col("r").getItem(3).cast("int").as("response"),
          col("r").getItem(4).cast("long").as("bytes")) ++ carry.map(col): _*)

  /** P9: bare page path from `"METHOD /path?query HTTP/1.1"` — the token
    * after the method, truncated at the first `?`
    * (RandomizedApacheLogAnalysis.java:97-107).
    */
  def pagePath(request: Column): Column =
    regexp_extract(request, """^\S+ ([^?\s]+)""", 1)

  /** P6: true iff the page path starts with any of the 9 attack-probe
    * prefixes (startsWith over the list, RandomizedApacheLogAnalysis.java:56-75).
    */
  def isHackPath(path: Column): Column =
    HackPrefixes.map(p => path.startsWith(p)).reduce(_ || _)

  /** [[isHackPath]] fused into ONE regex over the raw request string:
    * `^METHOD<space><any prefix>` — same semantics (the prefixes contain no
    * regex metacharacters), 1 regex per row instead of path-extract + 9
    * startsWith branches. Prefer this in query pipelines.
    */
  val HackRequestRegex: String = "^\\S+ (" + HackPrefixes.mkString("|") + ")"

  def isHackRequest(request: Column): Column = request.rlike(HackRequestRegex)
}
