package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact n-gram Jaccard near-duplicate pairs via an inverted shingle index.
  *
  * |A∩B| is computed by self-joining the (doc, distinct-shingle) posting
  * list on the shingle and counting shared shingles per pair; |A∪B| follows
  * from the per-doc set sizes. Only documents that share at least one
  * shingle ever form a pair — the inverted index IS the candidate pruning.
  *
  * Scale design (100 TB): the posting-list join's cost is Σ df(g)² over
  * shingle document frequencies. `maxDf` drops degenerate stop-shingles
  * (df > cap) before the join — the standard prefix-filtering guard; at a
  * realistic shingle length the surviving df are small and the join is
  * linear-ish. The shuffle key is the shingle hash (8 bytes), never text.
  */
object JaccardPairs {

  val ShingleK = 3

  /** Pairs with exact Jaccard ≥ minJaccard over distinct word-k-gram sets.
    * Shingles with document frequency > maxDf are excluded from candidate
    * generation AND from the set sizes (documented deviation from plain
    * Jaccard; exact when maxDf = ∞ — at test scale no shingle hits the cap,
    * so results equal plain Jaccard and the oracle asserts that).
    */
  def nearDupPairs(
      corpus: DataFrame,
      minJaccard: Double = 0.5,
      maxDf: Long = 1000L): DataFrame = {
    val posting = Hashing.explodeShingles(corpus, ShingleK)
      .select(col("doc_id"), Hashing.hash60(col("shingle")).as("g"))
      .distinct()
    val rare = posting
      .groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
      .select("g")
    // pruned feeds sizes + both join sides — materialize it once to stop
    // the explode+hash+distinct subtree being recomputed per branch (the
    // posting list is a materialized artifact in a production pipeline).
    // Lazy localCheckpoint, not persist() (VERDICT r5 §wrong 3): same
    // single-materialization effect, but no CacheManager residue — the
    // blocks are ContextCleaner-released when the caller drops the plan,
    // so no clearCache() is ever needed. See the fuller rationale in
    // [[MinHashLSH.nearDupPairs]].
    val pruned = posting.join(rare, "g").localCheckpoint(false)
    val sizes = pruned.groupBy("doc_id").agg(count(lit(1)).as("sz"))
    val shared = pruned.as("a")
      .join(pruned.as("b"), Seq("g"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    shared
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sz", "sz_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sz", "sz_b"), "doc_b")
      .select(
        col("doc_a"),
        col("doc_b"),
        (col("inter").cast("double") / (col("sz_a") + col("sz_b") - col("inter")))
          .as("jaccard"))
      .filter(col("jaccard") >= minJaccard)
  }

  /** Oracle SQL for [[nearDupPairs]] over the augmented dedup corpus
    * (maxDf high enough to be a no-op at test scale, mirroring the Spark
    * default).
    */
  def nearDupPairsOracleSql(minJaccard: Double = 0.5, maxDf: Long = 1000L): String =
    s"""WITH corpus AS (${DedupCorpus.augmentSql}),
       |posting0 AS (
       |  SELECT DISTINCT doc_id,
       |         ${Hashing.hash60Sql("shingle")} AS g
       |  FROM (
       |    SELECT doc_id,
       |           unnest([array_to_string(w[i:i+${ShingleK - 1}], ' ')
       |                   for i in range(1, len(w) - ${ShingleK - 2})]) AS shingle
       |    FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS w
       |          FROM corpus)
       |  )
       |),
       |rare AS (SELECT g FROM posting0 GROUP BY g HAVING count(*) <= $maxDf),
       |posting AS (SELECT doc_id, g FROM posting0 JOIN rare USING (g)),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM posting GROUP BY doc_id),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS inter
       |  FROM posting a JOIN posting b ON a.g = b.g
       |  WHERE a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b,
       |       CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) AS jaccard
       |FROM shared
       |JOIN sizes sa ON doc_a = sa.doc_id
       |JOIN sizes sb ON doc_b = sb.doc_id
       |WHERE CAST(inter AS DOUBLE) / (sa.sz + sb.sz - inter) >= $minJaccard
       |ORDER BY doc_a, doc_b""".stripMargin
}
