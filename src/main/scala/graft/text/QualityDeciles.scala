package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-source quality-decile profile: rank every document within its
  * source by the heuristic quality score and report each decile's size,
  * char mass, and quality span — the table a curation ablation reads to
  * pick per-source quality cutoffs ("drop the bottom 3 deciles of crawl,
  * keep all of wiki").
  *
  * Scale design (100 TB): the naive spelling is
  * `ntile(10) OVER (PARTITION BY source ORDER BY quality)` — with ~20
  * sources that is a handful of corpus-sized single-task sorts. Instead
  * documents are globally ranked by (source, quality, doc_id) with
  * [[graft.operators.RangeRank]] (range shuffle + partitioned window +
  * broadcast offsets), and per-source ranks fall out by subtracting the
  * source's global offset — a `#sources`-row broadcast. Decile assignment
  * is the integer fraction `((r−1)·10) div n` rather than SQL NTILE (whose
  * remainder-to-leading-buckets rule is pointless complexity here); the
  * oracle computes the identical formula from `row_number`, so both
  * engines agree exactly, ties broken by doc_id.
  */
object QualityDeciles {

  val Buckets = 10L

  /** (source, decile 1..10, n_docs, sum_chars, min_q, max_q). */
  def profile(docs: DataFrame): DataFrame = {
    val scored = TextAnalysis.qualityScore(docs)
      .select("doc_id", "n_chars", "quality")
      .join(docs.select("doc_id", "source"), Seq("doc_id"))
    val ranked = graft.operators.RangeRank
      .withPos(scored, Seq("source", "quality", "doc_id"))
      .localCheckpoint(false)
    // #sources-row metadata: per-source totals + exclusive global offsets
    // (sources are range-contiguous in the global order, so a source's
    // in-source rank is pos − offset)
    val srcMeta = ranked.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(
          sum(col("n")).over(
            Window.orderBy("source").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
    ranked
      .join(broadcast(srcMeta), Seq("source"))
      .withColumn("decile", expr(s"((pos - off - 1) * $Buckets) div n + 1"))
      .groupBy("source", "decile")
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        min(col("quality")).as("min_q"),
        max(col("quality")).as("max_q"))
  }

  def profileOracleSql: String =
    s"""WITH qd AS (${TextAnalysis.qualityScoreOracleSql(ordered = false)}),
       |j AS (
       |  SELECT d.source, q.doc_id, q.n_chars, q.quality
       |  FROM qd q JOIN documents d USING (doc_id)
       |),
       |r AS (
       |  SELECT source, n_chars, quality,
       |         CAST(row_number() OVER (PARTITION BY source ORDER BY quality, doc_id)
       |              AS BIGINT) AS r,
       |         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM j
       |)
       |SELECT source, (r - 1) * $Buckets // n + 1 AS decile,
       |       count(*) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |       min(quality) AS min_q, max(quality) AS max_q
       |FROM r GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
