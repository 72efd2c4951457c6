package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{ReferenceQueries => RQ, Tables}
import graft.sampling.SamplingConfig

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Naming discipline: every aggregate/computed column is aliased identically
  * in the Spark pipeline and the DuckDB oracle SQL (the driver's compare
  * sorts columns by name before hashing values).
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference's flagship: sampled word count with HT scale-up
    * (SURVEY.md §7.3).
    */
  def entry(spark: SparkSession): DataFrame =
    RQ.wordCountSampled(
      Tables.documents(spark, "/root/testdata/sf0.001"),
      SamplingConfig(ratio = 0.1))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // --- reference parity (exact mode, ratio = 1.0) ---
    "wordcount" -> ((s, dir) => RQ.wordCount(Tables.documents(s, dir)).orderBy("word")),
    "charcount" -> ((s, dir) => RQ.charCount(Tables.documents(s, dir)).orderBy("ch")),
    "log_hack" -> ((s, dir) => RQ.logHack(Tables.events(s, dir)).orderBy("host")),
    "log_host" -> ((s, dir) => RQ.logHost(Tables.events(s, dir)).orderBy("host")),
    "log_dateweek" -> ((s, dir) => RQ.logDateweek(Tables.events(s, dir)).orderBy("dateweek")),
    "log_size" -> ((s, dir) => RQ.logSize(Tables.events(s, dir)).orderBy("bucket")),
    "log_totalsize" -> ((s, dir) => RQ.logTotalsize(Tables.events(s, dir))),
    "log_pagesize" -> ((s, dir) => RQ.logPagesize(Tables.events(s, dir)).orderBy("page")),
    "log_page" -> ((s, dir) => RQ.logPage(Tables.events(s, dir)).orderBy("page")),
    "wireless_links" -> ((s, dir) => RQ.wirelessLinks(Tables.events(s, dir)).orderBy("link")),
    // --- approximate mode (seeded sample + HT scale-up; no SQL oracle:
    // --- an external engine can't reproduce Spark's RNG stream) ---
    "wordcount_sampled_r10" -> ((s, dir) =>
      RQ.wordCountSampled(Tables.documents(s, dir), SamplingConfig(ratio = 0.1))
        .orderBy("word")),
    "wireless_sampled_r10" -> ((s, dir) =>
      RQ.sampled(Tables.events(s, dir), SamplingConfig(ratio = 0.1), RQ.wirelessLinks)._2
        .orderBy("link")))

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "wordcount" ->
      """SELECT word, count(*) AS cnt
        |FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
        |      FROM documents WHERE NOT regexp_matches(lower(text), '[0-9]'))
        |WHERE word <> '' AND NOT regexp_matches(word, '^[0-9]+$')
        |GROUP BY word ORDER BY word""".stripMargin,
    "charcount" ->
      """SELECT ch, count(*) AS cnt
        |FROM (SELECT unnest(string_split(text, '')) AS ch FROM documents)
        |WHERE ch <> '' GROUP BY ch ORDER BY ch""".stripMargin,
    "log_hack" ->
      """SELECT user_id AS host, count(*) AS cnt FROM events
        |WHERE regexp_matches(event_type, '^(err|sign)')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "log_host" ->
      "SELECT user_id AS host, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    "log_dateweek" ->
      "SELECT strftime(ts, '%a %H') AS dateweek, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    "log_size" ->
      """SELECT CAST(floor(value / 100) * 100 AS BIGINT) AS bucket, count(*) AS cnt
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "log_totalsize" ->
      "SELECT 'Total' AS key, round(sum(value), 2) AS total FROM events GROUP BY 1",
    "log_pagesize" ->
      """SELECT event_type AS page, round(sum(value), 2) AS total
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "log_page" ->
      "SELECT event_type AS page, count(*) AS cnt FROM events GROUP BY 1 ORDER BY 1",
    "wireless_links" ->
      """SELECT concat(greatest(user_id, k), '->', least(user_id, k)) AS link, count(*) AS cnt
        |FROM (SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |WHERE k IS NOT NULL GROUP BY 1 ORDER BY 1""".stripMargin)
}
