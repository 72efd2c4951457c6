package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.dedup.{Hashing, SavedArtifact}

/** Inverted (posting-list) index over the corpus — the retrieval face of
  * the engine: term-keyed `(term, doc_id, tf)` postings published once as
  * a TERM-BUCKET-PARTITIONED parquet artifact, then conjunctive keyword
  * search reads ONLY the queried terms' buckets (plan-time
  * PartitionFilters pruning — the [[graft.similarity.IvfIndex]] saved-
  * artifact discipline applied to text).
  *
  * Scale design (100 TB): the index is built with one tokenize pass + one
  * partial-agg'd `(term, doc)` aggregate (within-doc repeats collapse
  * map-side), written `partitionBy(bucket)` with postings sorted by
  * `(term, doc_id)` inside each bucket file so a posting list is a
  * contiguous sorted run. A K-term query prunes to ≤ K of [[NumBuckets]]
  * directories at planning time, then one partial-agg'd `groupBy(doc_id)`
  * intersects document-at-a-time — the shuffle carries only the queried
  * terms' postings, never the index. Skew note: stopword terms own huge
  * posting lists; a query containing one degrades toward a scan of that
  * list — the [[TfIdf.boilerplateTerms]] df-cut is the guard a production
  * deployment would apply at INDEX time (drop terms in > X % of docs, the
  * standard stoplist), left out here so the gate covers the unfiltered
  * semantics. Bucket hashing is [[Hashing.hash60]]-based, so the DuckDB
  * oracle replays the whole layout derivation and the search result is
  * bit-exact; the artifact itself is a pure function of the corpus — the
  * saved path re-gates like the incremental-dedup signature index.
  */
object InvertedIndex {

  /** Term-hash bucket fan-out. 64 directories keeps the fixture honest
    * (31-term vocab → sparse buckets) while the derivation is the same
    * `hash % buckets` a real deployment would size up; at web-corpus
    * vocabularies (10⁸ terms) buckets stay balanced by md5 uniformity.
    */
  val NumBuckets = 64

  /** Fixture search: one rare term (df ≈ 5 % — `dup` appears only in the
    * synthetic dup-text docs) AND two common ones, so the conjunction is
    * selective at every scale.
    */
  val QueryTerms: Seq[String] = Seq("dup", "vector", "query")

  /** (term, doc_id, tf, positions, b): tf = occurrences of term in doc,
    * positions = the term's sorted 1-based offsets in the doc's non-empty
    * token sequence (the POSITIONAL payload phrase search consumes — one
    * int per occurrence, the classical positional-index cost), b = the
    * term's [[NumBuckets]]-way md5 bucket. The positions aggregate is an
    * ObjectHashAggregate with per-(term, doc) state bounded by the doc's
    * own length — never corpus-scale.
    */
  def postings(docs: DataFrame): DataFrame =
    graft.queries.Tables.parallelismFloor(docs)
      .select(
        col("doc_id"),
        posexplode(filter(Hashing.words(col("text")), w => w =!= lit("")))
          .as(Seq("__i", "term")))
      .select(col("doc_id"), col("term"), (col("__i") + 1).cast("int").as("pos"))
      .groupBy("term", "doc_id")
      .agg(
        count(lit(1)).as("tf"),
        sort_array(collect_list(col("pos"))).as("positions"))
      .withColumn("b", pmod(Hashing.hash60(col("term")), lit(NumBuckets.toLong)).cast("int"))

  /** Driver-side twin of the bucket derivation for query planning —
    * lockstep with [[Hashing.hash60]] `% NumBuckets` (spec-pinned over the
    * whole live vocabulary).
    */
  def bucketOf(term: String): Int = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    (java.lang.Long.parseLong(hex.take(15), 16) % NumBuckets).toInt
  }

  /** Path of the published index for the corpus at `dir`, building it on
    * first use: bucket-partitioned, `(term, doc_id)`-sorted parquet keyed
    * by (content digest, NumBuckets) — a regenerated corpus or a changed
    * fan-out rebuilds instead of serving stale postings.
    */
  def ensureSavedIndex(spark: SparkSession, docs: DataFrame, dir: String): String = {
    val digest = graft.queries.Tables.contentDigest(
      graft.queries.Tables.path(dir, "documents"))
    SavedArtifact.ensure("graft_invidx", digest, Seq(NumBuckets, "v2pos")) { tmp =>
      postings(docs)
        .repartition(col("b"))
        .sortWithinPartitions("term", "doc_id")
        .write.partitionBy("b").parquet(tmp)
    }
  }

  /** Conjunctive (AND) keyword search against the saved index: documents
    * containing EVERY query term, with the summed term frequency as the
    * ranking mass. The bucket IN-list is computed driver-side from the
    * query alone, so the scan prunes to ≤ |terms| partitions before any
    * file is opened.
    */
  def searchAnd(
      spark: SparkSession,
      docs: DataFrame,
      dir: String,
      terms: Seq[String] = QueryTerms): DataFrame =
    searchAndFrom(
      spark.read.parquet(ensureSavedIndex(spark, docs, dir)), terms)

  /** The conjunctive core over any postings-shaped frame — shared by the
    * saved-artifact path and the probe (which builds postings in-line to
    * time the index construction itself).
    */
  def searchAndFrom(idx: DataFrame, terms: Seq[String] = QueryTerms): DataFrame = {
    val uniq = terms.distinct
    idx
      .filter(col("b").isin(uniq.map(bucketOf): _*) && col("term").isin(uniq: _*))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__nt"), sum(col("tf")).as("tf_sum"))
      .filter(col("__nt") === uniq.size)
      .select(col("doc_id"), col("tf_sum"))
  }

  /** Index observability: per-bucket distinct-term / posting / tf mass —
    * what an index operator checks for bucket balance before shipping.
    * Two-level aggregate (both partial-agg'd), reads the saved artifact.
    */
  def bucketStats(spark: SparkSession, docs: DataFrame, dir: String): DataFrame =
    spark.read.parquet(ensureSavedIndex(spark, docs, dir))
      .groupBy("b", "term")
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("tf_t"))
      .groupBy("b")
      .agg(
        count(lit(1)).as("n_terms"),
        sum(col("df")).as("n_postings"),
        sum(col("tf_t")).as("tf_total"))

  /** Ranked DISJUNCTIVE (OR) search: documents matching ANY query term,
    * scored by the [[TfIdf]] integer prominence convention
    * (`Σ tf·10⁶ div df` over matched terms — rarer terms weigh more, no
    * float log in an oracle path), top [[RankK]] by (score desc, doc_id).
    *
    * Scale shape: the same ≤ |terms| pruned bucket scan; the per-term df
    * table is an aggregate over ONLY the matched postings (broadcast back,
    * |terms| rows); ranking compiles to TakeOrderedAndProject — every
    * partition keeps k rows, no global sort (spec-pinned).
    */
  val RankK = 20

  def searchRanked(
      spark: SparkSession,
      docs: DataFrame,
      dir: String,
      terms: Seq[String] = QueryTerms): DataFrame = {
    val uniq = terms.distinct
    val idx = spark.read.parquet(ensureSavedIndex(spark, docs, dir))
    val matched = idx
      .filter(col("b").isin(uniq.map(bucketOf): _*) && col("term").isin(uniq: _*))
    val dfTable = matched.groupBy("term").agg(count(lit(1)).as("df"))
    matched
      .join(broadcast(dfTable), Seq("term"))
      .groupBy("doc_id")
      .agg(sum(expr("tf * 1000000 DIV df")).as("score"))
      .orderBy(col("score").desc, col("doc_id"))
      .limit(RankK)
  }

  /** Fixture phrase: hits at every scale, mid-frequency terms. */
  val PhraseTerms: Seq[String] = Seq("slow", "join", "sort")

  /** Every 4th doc plays the newly-arriving batch in the incremental
    * ingest split (the [[graft.dedup.IncrementalDedup]] convention).
    */
  val DeltaMod = 4L

  def baseDocs(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % DeltaMod =!= 0)

  def deltaDocs(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % DeltaMod === 0)

  /** The BASE slice's index as its own published artifact (params carry
    * the slice rule, so it never collides with the full-corpus index).
    */
  def ensureSavedBaseIndex(spark: SparkSession, docs: DataFrame, dir: String): String = {
    val digest = graft.queries.Tables.contentDigest(
      graft.queries.Tables.path(dir, "documents"))
    SavedArtifact.ensure(
      "graft_invidx", digest, Seq(NumBuckets, "v2pos", s"base$DeltaMod")) { tmp =>
      postings(baseDocs(docs))
        .repartition(col("b"))
        .sortWithinPartitions("term", "doc_id")
        .write.partitionBy("b").parquet(tmp)
    }
  }

  /** INCREMENTAL ingest search: the saved base index plus postings
    * computed from ONLY the delta batch — the base corpus is never
    * re-tokenized (spec-pinned: exactly one documents scan, the delta's,
    * in the executed plan). Because postings are per (term, doc) and the
    * slices are doc-disjoint, the union is exactly the full-corpus index,
    * so this path gates against the SAME full-recompute oracle as
    * [[searchAnd]] — merge ≡ recompute, the saved-sketch-vocab discipline.
    */
  def searchAndIncremental(
      spark: SparkSession,
      docs: DataFrame,
      dir: String,
      terms: Seq[String] = QueryTerms): DataFrame = {
    val uniq = terms.distinct
    val keep: DataFrame => DataFrame = df => df
      .filter(col("b").isin(uniq.map(bucketOf): _*) && col("term").isin(uniq: _*))
      .select("term", "doc_id", "tf")
    val base = keep(spark.read.parquet(ensureSavedBaseIndex(spark, docs, dir)))
    val delta = keep(postings(deltaDocs(docs)))
    base.unionAll(delta)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("__nt"), sum(col("tf")).as("tf_sum"))
      .filter(col("__nt") === uniq.size)
      .select(col("doc_id"), col("tf_sum"))
  }

  /** PHRASE search against the positional index: documents containing the
    * exact consecutive token sequence `phrase`, with the number of start
    * positions. The queried terms' posting rows (pruned buckets, as in
    * [[searchAnd]]) pivot into one row per doc via a conditional
    * `first(ignoreNulls)` aggregate — one partial-agg'd shuffle carrying
    * only the queried terms' position arrays, no self-join per phrase
    * term — and the alignment check is an in-row HOF
    * (`filter(p₀, x -> p₁ ∋ x+1 ∧ p₂ ∋ x+2 …)`): per-doc cost is
    * |positions(t₀)| × Σ probe lengths, bounded by the doc's own length,
    * never corpus-scale. Duplicate phrase terms reuse one pivot column
    * (the `batch batch batch` case, spec-pinned).
    */
  def searchPhrase(
      spark: SparkSession,
      docs: DataFrame,
      dir: String,
      phrase: Seq[String] = PhraseTerms): DataFrame = {
    require(phrase.nonEmpty)
    val uniq = phrase.distinct
    val colIdx = uniq.zipWithIndex.toMap
    val idx = spark.read.parquet(ensureSavedIndex(spark, docs, dir))
    val matched = idx
      .filter(col("b").isin(uniq.map(bucketOf): _*) && col("term").isin(uniq: _*))
    val aggs = uniq.zipWithIndex.map { case (t, i) =>
      first(when(col("term") === t, col("positions")), ignoreNulls = true).as(s"__p$i")
    }
    val piv = matched.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
    val allPresent = uniq.indices.map(i => col(s"__p$i").isNotNull).reduce(_ && _)
    def pArr(t: String) = col(s"__p${colIdx(t)}")
    val nMatches =
      if (phrase.size == 1) size(pArr(phrase.head))
      else size(filter(pArr(phrase.head), x =>
        phrase.zipWithIndex.tail
          .map { case (t, j) => array_contains(pArr(t), x + j) }
          .reduce(_ && _)))
    piv.filter(allPresent)
      .select(col("doc_id"), nMatches.cast("long").as("n_matches"))
      .filter(col("n_matches") >= 1)
  }

  /** Proximity ("A NEAR B") search defaults. */
  val NearSlop = 4
  val NearTerms: (String, String) = ("slow", "join")

  /** PROXIMITY search: documents where `t2` occurs within `slop` tokens
    * AFTER an occurrence of `t1`, with the number of such anchors. For
    * the two-term form the independent-exists spelling is exact (no
    * chaining needed); same pruned pivot as [[searchPhrase]], alignment
    * one in-row HOF (`filter(p1, x -> exists(p2, y -> x < y ≤ x+slop))`).
    */
  def searchNear(
      spark: SparkSession,
      docs: DataFrame,
      dir: String,
      t1: String = NearTerms._1,
      t2: String = NearTerms._2,
      slop: Int = NearSlop): DataFrame = {
    require(t1 != t2, "proximity terms must differ (use searchPhrase for runs)")
    val idx = spark.read.parquet(ensureSavedIndex(spark, docs, dir))
    val matched = idx
      .filter(col("b").isin(Seq(t1, t2).map(bucketOf).distinct: _*) &&
        col("term").isin(t1, t2))
    val piv = matched.groupBy("doc_id").agg(
      first(when(col("term") === t1, col("positions")), ignoreNulls = true).as("__p1"),
      first(when(col("term") === t2, col("positions")), ignoreNulls = true).as("__p2"))
    piv
      .filter(col("__p1").isNotNull && col("__p2").isNotNull)
      .select(
        col("doc_id"),
        size(filter(col("__p1"), x =>
          exists(col("__p2"), y => y > x && y <= x + lit(slop))))
          .cast("long").as("n_anchors"))
      .filter(col("n_anchors") >= 1)
  }

  def nearOracleSql(
      t1: String = NearTerms._1,
      t2: String = NearTerms._2,
      slop: Int = NearSlop): String = {
    def esc(t: String) = t.replace("'", "''")
    s"""WITH f AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
       |                     x -> x <> '') AS f
       |  FROM documents
       |), pos AS (
       |  SELECT doc_id,
       |         unnest([{'term': f[i], 'pos': i} for i in range(1, len(f)+1)]) AS u
       |  FROM f
       |), post AS (
       |  SELECT term, doc_id, list_sort(list(pos)) AS ps
       |  FROM (SELECT doc_id, u.term AS term, u.pos AS pos FROM pos)
       |  GROUP BY term, doc_id
       |), piv AS (
       |  SELECT doc_id,
       |         any_value(CASE WHEN term = '${esc(t1)}' THEN ps END) AS p1,
       |         any_value(CASE WHEN term = '${esc(t2)}' THEN ps END) AS p2
       |  FROM post WHERE term IN ('${esc(t1)}', '${esc(t2)}') GROUP BY doc_id
       |)
       |SELECT doc_id, n_anchors FROM (
       |  SELECT doc_id,
       |         CAST(len(list_filter(p1, x ->
       |           len(list_filter(p2, y -> y > x AND y <= x + $slop)) > 0))
       |           AS BIGINT) AS n_anchors
       |  FROM piv WHERE p1 IS NOT NULL AND p2 IS NOT NULL
       |) WHERE n_anchors >= 1
       |ORDER BY doc_id""".stripMargin
  }

  /** FACETED search: the conjunctive hit set rolled up per corpus source
    * — hits and tf mass per facet. The doc_id-only hit set joins back to
    * the documents table id-keyed (text never moves), then one bounded
    * aggregate.
    */
  def searchFacets(
      spark: SparkSession,
      docs: DataFrame,
      dir: String,
      terms: Seq[String] = QueryTerms): DataFrame =
    searchAnd(spark, docs, dir, terms)
      .join(docs.select(col("doc_id"), col("source")), Seq("doc_id"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"), sum(col("tf_sum")).as("tf_sum"))

  def facetsOracleSql(terms: Seq[String] = QueryTerms): String = {
    val uniq = terms.distinct
    val inList = uniq.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""$postCte,
       |hits AS (
       |  SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tf_sum
       |  FROM post WHERE term IN ($inList)
       |  GROUP BY doc_id HAVING count(*) = ${uniq.size}
       |)
       |SELECT d.source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(h.tf_sum) AS BIGINT) AS tf_sum
       |FROM hits h JOIN documents d USING (doc_id)
       |GROUP BY d.source
       |ORDER BY d.source""".stripMargin
  }

  /** Posting CTE shared by both oracle spellings — recomputes the
    * deterministic index content directly from the documents table (the
    * artifact is a pure function of it).
    */
  private def postCte: String =
    s"""WITH toks AS (
       |  SELECT doc_id,
       |         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
       |  FROM documents
       |), post AS (
       |  SELECT term, doc_id, CAST(count(*) AS BIGINT) AS tf,
       |         CAST(${Hashing.hash60Sql("term")} % $NumBuckets AS INT) AS b
       |  FROM toks WHERE term <> '' GROUP BY term, doc_id
       |)""".stripMargin

  def searchOracleSql(terms: Seq[String] = QueryTerms): String = {
    val uniq = terms.distinct
    val inList = uniq.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""$postCte
       |SELECT doc_id, CAST(sum(tf) AS BIGINT) AS tf_sum
       |FROM post WHERE term IN ($inList)
       |GROUP BY doc_id HAVING count(*) = ${uniq.size}
       |ORDER BY doc_id""".stripMargin
  }

  def rankedOracleSql(terms: Seq[String] = QueryTerms): String = {
    val uniq = terms.distinct
    val inList = uniq.map(t => s"'${t.replace("'", "''")}'").mkString(", ")
    s"""$postCte,
       |matched AS (SELECT * FROM post WHERE term IN ($inList)),
       |dfs AS (SELECT term, CAST(count(*) AS BIGINT) AS df
       |        FROM matched GROUP BY term)
       |SELECT doc_id, CAST(sum(tf * 1000000 // df) AS BIGINT) AS score
       |FROM matched JOIN dfs USING (term)
       |GROUP BY doc_id
       |ORDER BY score DESC, doc_id
       |LIMIT $RankK""".stripMargin
  }

  def phraseOracleSql(phrase: Seq[String] = PhraseTerms): String = {
    val uniq = phrase.distinct
    val colIdx = uniq.zipWithIndex.toMap
    def esc(t: String) = t.replace("'", "''")
    val inList = uniq.map(t => s"'${esc(t)}'").mkString(", ")
    val cases = uniq.zipWithIndex
      .map { case (t, i) =>
        s"any_value(CASE WHEN term = '${esc(t)}' THEN ps END) AS p$i" }
      .mkString(",\n       ")
    val allPresent = uniq.indices.map(i => s"p$i IS NOT NULL").mkString(" AND ")
    val nExpr =
      if (phrase.size == 1) s"len(p${colIdx(phrase.head)})"
      else {
        val preds = phrase.zipWithIndex.tail
          .map { case (t, j) => s"list_contains(p${colIdx(t)}, x + $j)" }
          .mkString(" AND ")
        s"len(list_filter(p${colIdx(phrase.head)}, x -> $preds))"
      }
    s"""WITH f AS (
       |  SELECT doc_id,
       |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
       |                     x -> x <> '') AS f
       |  FROM documents
       |), pos AS (
       |  SELECT doc_id,
       |         unnest([{'term': f[i], 'pos': i} for i in range(1, len(f)+1)]) AS u
       |  FROM f
       |), post AS (
       |  SELECT term, doc_id, list_sort(list(pos)) AS ps
       |  FROM (SELECT doc_id, u.term AS term, u.pos AS pos FROM pos)
       |  GROUP BY term, doc_id
       |), piv AS (
       |  SELECT doc_id,
       |       $cases
       |  FROM post WHERE term IN ($inList) GROUP BY doc_id
       |)
       |SELECT doc_id, n_matches FROM (
       |  SELECT doc_id, CAST($nExpr AS BIGINT) AS n_matches
       |  FROM piv WHERE $allPresent
       |) WHERE n_matches >= 1
       |ORDER BY doc_id""".stripMargin
  }

  def bucketStatsOracleSql: String =
    s"""$postCte
       |SELECT b,
       |       CAST(count(DISTINCT term) AS BIGINT) AS n_terms,
       |       CAST(count(*) AS BIGINT) AS n_postings,
       |       CAST(sum(tf) AS BIGINT) AS tf_total
       |FROM post GROUP BY b
       |ORDER BY b""".stripMargin
}
