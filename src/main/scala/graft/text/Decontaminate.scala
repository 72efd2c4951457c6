package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Benchmark decontamination: drop every training document that shares an
  * 8-word n-gram with the benchmark (eval) set — the standard guard against
  * test-set leakage into a training corpus.
  *
  * Scale design (100 TB): benchmark suites are tiny (MBs of text) next to
  * the corpus, so the benchmark's distinct gram-hash set is BROADCAST and
  * the corpus-side probe is a map-side semi-join — the corpus is scanned
  * ONCE, shuffles nothing for the probe, and only the matched doc_ids
  * (a doc_id-only table, orders of magnitude smaller than the corpus)
  * reach the final anti-join. Grams travel as 60-bit md5 hashes
  * ([[Hashing.hash60]]), never as text.
  *
  * The benchmark set here is carved deterministically out of the documents
  * table (`doc_id % benchEvery = 0`) so the oracle can reproduce it; a real
  * pipeline would pass an external eval corpus as `bench`.
  */
object Decontaminate {

  /** 8-gram overlap is the common contamination test (docs shorter than 8
    * words produce no grams and are never flagged).
    */
  val GramK = 8

  /** Every 50th doc_id plays the benchmark role at test scale. */
  val BenchEvery = 50L

  /** The surviving (clean) training documents: non-benchmark docs sharing
    * no `k`-gram with the benchmark slice. Output: doc_id, n_chars.
    */
  def clean(docs: DataFrame, benchEvery: Long = BenchEvery, k: Int = GramK): DataFrame = {
    val bench = docs.filter(col("doc_id") % benchEvery === 0)
    val corpus = docs.filter(col("doc_id") % benchEvery =!= 0)
    val benchGrams = Hashing.explodeShingles(bench, k)
      .select(Hashing.hash60(col("shingle")).as("g"))
      .distinct()
    val contaminated = Hashing.explodeShingles(corpus, k)
      .select(col("doc_id"), Hashing.hash60(col("shingle")).as("g"))
      .join(broadcast(benchGrams), Seq("g"), "left_semi")
      .select("doc_id")
      .distinct()
    corpus
      .join(contaminated, Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("n_chars"))
  }

  /** DuckDB oracle for [[clean]] (k = [[GramK]] grams; slice bounds follow
    * the [[graft.dedup.JaccardPairs]] oracle pattern: `w[i:i+k-1]` is the
    * inclusive 1-based k-slice, `range(1, len(w)-k+2)` is empty for docs
    * shorter than k words).
    */
  def cleanOracleSql(benchEvery: Long = BenchEvery, k: Int = GramK): String =
    s"""WITH bench AS (SELECT * FROM documents WHERE doc_id % $benchEvery = 0),
       |corpus AS (SELECT * FROM documents WHERE doc_id % $benchEvery <> 0),
       |bg AS (
       |  SELECT DISTINCT ${Hashing.hash60Sql("shingle")} AS g
       |  FROM (
       |    SELECT unnest([array_to_string(w[i:i+${k - 1}], ' ')
       |                   for i in range(1, len(w) - ${k - 2})]) AS shingle
       |    FROM (SELECT regexp_split_to_array(lower(text), '[^a-z0-9]+') AS w
       |          FROM bench)
       |  )
       |),
       |contaminated AS (
       |  SELECT DISTINCT doc_id
       |  FROM (
       |    SELECT doc_id, ${Hashing.hash60Sql("shingle")} AS g
       |    FROM (
       |      SELECT doc_id,
       |             unnest([array_to_string(w[i:i+${k - 1}], ' ')
       |                     for i in range(1, len(w) - ${k - 2})]) AS shingle
       |      FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS w
       |            FROM corpus)
       |    )
       |  )
       |  JOIN bg USING (g)
       |)
       |SELECT doc_id, n_chars FROM corpus
       |WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
       |ORDER BY doc_id""".stripMargin
}
