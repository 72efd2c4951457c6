package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Corpus-statistics operators: collocation mining (which adjacent word
  * pairs co-occur more than their parts predict — the phrase-vocabulary /
  * tokenizer-merge prep signal) and per-source lexical diversity (the
  * Simpson index a mixture designer reads next to source weights).
  *
  * Both follow the cross-engine determinism doctrine: ranking scores are
  * INTEGER fixed-point (the PMI ranking drops its corpus-global constant
  * so no log/division chain ever leaves integers; the diversity index is
  * decimal(38,0) arithmetic — DuckDB hugeint — with one final integer
  * division), so every value hash-gates.
  */
object CorpusStats {

  /** Collocation top-k. */
  val TopK = 50

  /** Adjacent-bigram collocations ranked by the integer lift
    * `c_xy·10⁶ div (c_x·c_y)` — monotone in PMI (PMI = lift × N²/N₂, a
    * corpus-global constant) without a float log. Two partial-agg'd count
    * aggregates (bigram, unigram — both collapse map-side), two
    * term-keyed 1:1 joins against the unigram table, top-[[TopK]] by
    * (score, w1, w2) as TakeOrderedAndProject — no global sort. At a real
    * corpus the unigram table broadcasts (vocab ≪ bigram table) and the
    * bigram aggregate is the only big shuffle.
    */
  def collocations(docs: DataFrame): DataFrame = {
    val words = graft.queries.Tables.parallelismFloor(docs)
      .select(col("doc_id"), Hashing.words(col("text")).as("__w"))
    val bigrams = words
      .select(explode(Hashing.shingles(col("__w"), 2)).as("bg"))
      .filter(!col("bg").startsWith(" ") && !col("bg").endsWith(" ") &&
        !col("bg").contains("  "))
      .groupBy("bg").agg(count(lit(1)).as("c_xy"))
      .select(
        split(col("bg"), " ").getItem(0).as("w1"),
        split(col("bg"), " ").getItem(1).as("w2"),
        col("c_xy"))
    val unigrams = words
      .select(explode(col("__w")).as("term"))
      .filter(col("term") =!= "")
      .groupBy("term").agg(count(lit(1)).as("c"))
    bigrams
      .join(unigrams.select(col("term").as("w1"), col("c").as("c_x")), Seq("w1"))
      .join(unigrams.select(col("term").as("w2"), col("c").as("c_y")), Seq("w2"))
      .select(col("w1"), col("w2"), col("c_xy"),
        expr("c_xy * 1000000 DIV (c_x * c_y)").as("lift"))
      .orderBy(col("lift").desc, col("w1"), col("w2"))
      .limit(TopK)
  }

  def collocationsOracleSql: String =
    s"""WITH w AS (
       |  SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS w
       |  FROM documents
       |), bg AS (
       |  SELECT split_part(bg, ' ', 1) AS w1, split_part(bg, ' ', 2) AS w2,
       |         CAST(count(*) AS BIGINT) AS c_xy
       |  FROM (
       |    SELECT unnest([array_to_string(w[i:i+1], ' ')
       |                   for i in range(1, len(w))]) AS bg
       |    FROM w
       |  )
       |  WHERE bg NOT LIKE ' %' AND bg NOT LIKE '% ' AND bg NOT LIKE '%  %'
       |  GROUP BY 1, 2
       |), uni AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS c
       |  FROM (SELECT unnest(w) AS term FROM w) WHERE term <> ''
       |  GROUP BY term
       |)
       |SELECT w1, w2, c_xy,
       |       CAST(c_xy * 1000000 // (ux.c * uy.c) AS BIGINT) AS lift
       |FROM bg
       |JOIN uni ux ON ux.term = w1
       |JOIN uni uy ON uy.term = w2
       |ORDER BY lift DESC, w1, w2
       |LIMIT $TopK""".stripMargin

  /** Per-source lexical diversity: token count, type (distinct-term)
    * count, and the Gini–Simpson index `1 − Σp²` in parts-per-million —
    * `(T² − Σc²)·10⁶ div T²`, all decimal(38,0) (hugeint in the oracle)
    * so T² never overflows at corpus scale. Two-level aggregate: the
    * (source, term) collapse is partial-agg'd map-side, the per-source
    * roll-up touches |sources|×|vocab| rows at most.
    */
  def diversityBySource(docs: DataFrame): DataFrame =
    graft.queries.Tables.parallelismFloor(docs)
      .select(col("source"), explode(Hashing.words(col("text"))).as("term"))
      .filter(col("term") =!= "")
      .groupBy("source", "term").agg(count(lit(1)).as("c"))
      .groupBy("source")
      .agg(
        sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(col("c").cast("decimal(38,0)") * col("c").cast("decimal(38,0)"))
          .as("__s2"))
      .select(
        col("source"), col("n_tokens"), col("n_types"),
        // IntegralDivide (DIV) on decimals, never `/`: Spark's decimal
        // division rounds HALF_UP at the result scale before any cast,
        // which can land one above DuckDB's floored `//` on exact-boundary
        // quotients — DIV floors on both engines
        expr("""CAST(((CAST(n_tokens AS DECIMAL(38,0)) * n_tokens - __s2)
                 * 1000000)
                DIV (CAST(n_tokens AS DECIMAL(38,0)) * n_tokens) AS BIGINT)""")
          .as("simpson_ppm"))

  /** Snapshot DRIFT report — the data-versioning readout between two
    * corpus snapshots (base = the [[InvertedIndex.DeltaMod]] ingest
    * convention's prior slice, after = the full corpus): per source,
    * document and char-mass counts before/after plus added/removed docs.
    * Removed is computed honestly by an id anti-join (0 for this
    * append-only fixture, and the gate proves it). Three partial-agg'd
    * per-source aggregates + one |sources|-bounded full-outer join —
    * text never shuffles, output bounded by the source count.
    */
  def snapshotDrift(docs: DataFrame): DataFrame = {
    val before = InvertedIndex.baseDocs(docs)
    def perSource(df: DataFrame, n: String, c: String): DataFrame =
      df.groupBy("source")
        .agg(count(lit(1)).as(n), sum(col("n_chars")).as(c))
    val added = perSource(InvertedIndex.deltaDocs(docs), "added_docs", "added_chars")
    val removedCnt = before
      .join(docs.select("doc_id"), Seq("doc_id"), "left_anti")
      .groupBy("source").agg(count(lit(1)).as("removed_docs"))
    perSource(before, "docs_before", "chars_before")
      .join(perSource(docs, "docs_after", "chars_after"), Seq("source"), "full_outer")
      .join(added, Seq("source"), "full_outer")
      .join(removedCnt, Seq("source"), "full_outer")
      .select(
        col("source"),
        coalesce(col("docs_before"), lit(0L)).as("docs_before"),
        coalesce(col("docs_after"), lit(0L)).as("docs_after"),
        coalesce(col("added_docs"), lit(0L)).as("added_docs"),
        coalesce(col("added_chars"), lit(0L)).as("added_chars"),
        coalesce(col("removed_docs"), lit(0L)).as("removed_docs"))
  }

  def snapshotDriftOracleSql: String = {
    val mod = InvertedIndex.DeltaMod
    s"""WITH before AS (SELECT * FROM documents WHERE doc_id % $mod <> 0),
       |delta AS (SELECT * FROM documents WHERE doc_id % $mod = 0),
       |b AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_before,
       |             CAST(sum(n_chars) AS BIGINT) AS chars_before
       |      FROM before GROUP BY source),
       |a AS (SELECT source, CAST(count(*) AS BIGINT) AS docs_after,
       |             CAST(sum(n_chars) AS BIGINT) AS chars_after
       |      FROM documents GROUP BY source),
       |ad AS (SELECT source, CAST(count(*) AS BIGINT) AS added_docs,
       |              CAST(sum(n_chars) AS BIGINT) AS added_chars
       |       FROM delta GROUP BY source),
       |rm AS (SELECT source, CAST(count(*) AS BIGINT) AS removed_docs
       |       FROM before WHERE doc_id NOT IN (SELECT doc_id FROM documents)
       |       GROUP BY source)
       |SELECT source,
       |       coalesce(docs_before, 0) AS docs_before,
       |       coalesce(docs_after, 0) AS docs_after,
       |       coalesce(added_docs, 0) AS added_docs,
       |       coalesce(added_chars, 0) AS added_chars,
       |       coalesce(removed_docs, 0) AS removed_docs
       |FROM b
       |FULL OUTER JOIN a USING (source)
       |FULL OUTER JOIN ad USING (source)
       |FULL OUTER JOIN rm USING (source)
       |ORDER BY source""".stripMargin
  }

  def diversityOracleSql: String =
    s"""WITH st AS (
       |  SELECT source, term, CAST(count(*) AS BIGINT) AS c
       |  FROM (
       |    SELECT source,
       |           unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS term
       |    FROM documents
       |  ) WHERE term <> ''
       |  GROUP BY source, term
       |)
       |SELECT source,
       |       CAST(sum(c) AS BIGINT) AS n_tokens,
       |       CAST(count(*) AS BIGINT) AS n_types,
       |       CAST((sum(c)::HUGEINT * sum(c)::HUGEINT
       |             - sum(c::HUGEINT * c::HUGEINT)) * 1000000
       |            // (sum(c)::HUGEINT * sum(c)::HUGEINT) AS BIGINT) AS simpson_ppm
       |FROM st GROUP BY source
       |ORDER BY source""".stripMargin
}
