package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Vocabulary reconciliation between two corpus components — per-word
  * occurrence counts FULL-OUTER joined so words exclusive to either side
  * survive with a zero on the other (the drift report a curation team
  * reads when a new crawl snapshot or re-scraped source lands: which
  * terms appeared, which vanished, which shifted).
  *
  * Physically this is the engine's declared FULL OUTER shuffle join —
  * the one join type the rest of the query surface never exercises
  * (inner/left/semi/anti/outer-left all appear elsewhere): both count
  * tables hash-exchange on `word` and the join must emit null-padded
  * rows from BOTH sides. Each side is first collapsed to one row per
  * word (map-side partial aggregation), so the join input is vocabulary-
  * not corpus-sized.
  */
object VocabDiff {

  /** (word, cnt_a, cnt_b, diff) over the two sources' token streams,
    * absent words counted 0, ordered by word.
    */
  def diff(docs: DataFrame, srcA: String = "src0", srcB: String = "src1"): DataFrame = {
    def counts(src: String, as: String) = docs
      .filter(col("source") === src)
      .select(explode(Hashing.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy(col("word"))
      .agg(count(lit(1)).as(as))
    counts(srcA, "cnt_a")
      .join(counts(srcB, "cnt_b"), Seq("word"), "full_outer")
      .select(
        col("word"),
        coalesce(col("cnt_a"), lit(0L)).as("cnt_a"),
        coalesce(col("cnt_b"), lit(0L)).as("cnt_b"),
        (coalesce(col("cnt_a"), lit(0L)) - coalesce(col("cnt_b"), lit(0L))).as("diff"))
      .orderBy(col("word"))
  }

  /** DuckDB oracle for [[diff]]. */
  def diffOracleSql(srcA: String = "src0", srcB: String = "src1"): String = {
    def side(src: String, as: String) =
      s"""SELECT t AS word, count(*) AS $as
         |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS t
         |        FROM documents WHERE source = '$src')
         |  WHERE t <> '' GROUP BY 1""".stripMargin
    s"""WITH a AS (${side(srcA, "cnt_a")}),
       |b AS (${side(srcB, "cnt_b")})
       |SELECT word,
       |       coalesce(cnt_a, 0) AS cnt_a,
       |       coalesce(cnt_b, 0) AS cnt_b,
       |       coalesce(cnt_a, 0) - coalesce(cnt_b, 0) AS diff
       |FROM a FULL OUTER JOIN b USING (word)
       |ORDER BY word""".stripMargin
  }
}
