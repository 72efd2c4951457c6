package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Distributed BPE vocabulary induction (Sennrich et al., "Neural Machine
  * Translation of Rare Words with Subword Units", ACL 2016) — the
  * corpus-scale tokenizer-training pass of an LLM data pipeline, and the
  * classic "BPE on MapReduce" problem: learn the top merge rules from a
  * 100 TB corpus without ever holding it on one machine.
  *
  * Scale design: the ONLY corpus-scale work is the word-frequency
  * aggregation (tokenize → map-side-combining count — one shuffle whose
  * width is the distinct vocabulary, not the corpus). Every merge round
  * then operates on the word-frequency DICT (heavy-tailed: millions of
  * rows for a 100 TB corpus, thousands here), exactly how production BPE
  * trainers work. Per round: adjacent-pair weighted count (partial agg),
  * global argmax via `TakeOrderedAndProject(1)` (per-partition top-1,
  * driver merges K rows — no global sort), then the 1-row winner
  * broadcast-crossJoined back so every word applies the merge with one
  * codegen'd `replace`. No collect in the loop; the dict is
  * lazy-localCheckpointed per round so round i+1 never recomputes round i.
  *
  * Symbol encoding: a word is held as `||s1||s2||...||$||` (`$` = the
  * end-of-word marker, Sennrich's `</w>`). Doubled `|` delimiters make the
  * merge a plain string `replace(s, '|l||r|', '|lr|')`: the pattern can
  * only match at true symbol boundaries (token-internal chars never adjoin
  * a single `|`), and both engines' `replace` scan left-to-right
  * non-overlapping — exactly BPE's greedy merge order (`a a a` → `aa a`).
  *
  * Everything is integer/string-deterministic (counts, byte-order
  * tiebreaks), so the DuckDB oracle replays the full [[Rounds]]-round
  * recurrence as unrolled CTEs — the PageRank pattern
  * (`graphs/PageRank.scala`) applied to vocabulary learning.
  *
  * Reference scope: the reference engine has no tokenizer training; this
  * is part of the LLM-pipeline layer the brief adds on top (tokenization
  * counterpart of `text/TextAnalysis.tokenCounts`).
  */
object BpeVocab {

  /** Merge rounds learned (each yields one vocab entry). Kept modest so
    * the unrolled oracle stays readable; the loop itself is O(rounds ×
    * dict) and at production scale runs thousands of rounds.
    */
  val Rounds = 8

  /** End-of-word marker symbol (never a corpus character: corpus words are
    * `[a-z0-9]+`).
    */
  val EndMark = "$"

  /** (word, cnt) corpus word-frequency dict — the single corpus-scale
    * aggregation everything downstream rides on.
    */
  def wordCounts(docs: DataFrame): DataFrame =
    docs
      .select(explode(Hashing.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .groupBy("word")
      .agg(count(lit(1)).as("cnt"))

  /** Initial symbol string: every char its own symbol plus the end mark —
    * `the` → `||t||h||e||$||`.
    */
  private def initSymbols(word: Column): Column =
    concat(regexp_replace(word, "(.)", "\\|\\|$1"), lit("||" + EndMark + "||"))

  /** The symbol list of a dict row's current string form. */
  private def symsOf(s: Column): Column =
    filter(split(s, "\\|\\|"), x => x =!= "")

  /** Weighted adjacent-pair counts over the current dict: (l, r, c). */
  private def pairCounts(words: DataFrame): DataFrame =
    words
      .select(col("cnt"), symsOf(col("s")).as("__syms"))
      .filter(size(col("__syms")) >= 2)
      .select(
        col("cnt"),
        explode(transform(
          sequence(lit(1), size(col("__syms")) - 1),
          j => struct(
            element_at(col("__syms"), j).as("l"),
            element_at(col("__syms"), j + 1).as("r")))).as("p"))
      .groupBy(col("p.l").as("l"), col("p.r").as("r"))
      .agg(sum("cnt").as("c"))

  /** Learn up to [[Rounds]] merges. Returns (merges, finalDict):
    * merges = (round, left_sym, right_sym, merged, pair_count), one row
    * per LEARNED round — fewer than [[Rounds]] when the corpus runs out
    * of adjacent pairs first; finalDict = (word, cnt, s) with s the
    * fully-merged symbol string (the trained segmenter, applied by
    * [[tokenCounts]]).
    */
  def learn(docs: DataFrame): (DataFrame, DataFrame) = {
    var words = wordCounts(docs)
      .select(col("word"), col("cnt"), initSymbols(col("word")).as("s"))
      .localCheckpoint(false)
    var merges = Vector.empty[DataFrame]
    var round = 1
    var exhausted = false
    while (round <= Rounds && !exhausted) {
      // top-1 by (count desc, byte-order pair asc): per-partition top-1 +
      // driver merge (TakeOrderedAndProject), never a global sort
      val best = pairCounts(words)
        .orderBy(col("c").desc, col("l"), col("r"))
        .limit(1)
        .localCheckpoint(false)
      merges :+= best.select(
        lit(round).as("round"),
        col("l").as("left_sym"),
        col("r").as("right_sym"),
        concat(col("l"), col("r")).as("merged"),
        col("c").as("pair_count"))
      if (best.isEmpty) {
        // no adjacent pair remains anywhere (every word fully merged):
        // stop learning — without this, the crossJoin with the EMPTY
        // best frame would annihilate the dict itself, losing the
        // trained segmenter (review finding). isEmpty is free here: best
        // is already localCheckpoint-materialized.
        exhausted = true
      } else {
        words = words
          .crossJoin(broadcast(best))
          .withColumn("s", expr(
            "replace(s, '|' || l || '||' || r || '|', '|' || l || r || '|')"))
          .drop("l", "r", "c")
          .localCheckpoint(false)
      }
      round += 1
    }
    (merges.reduce(_ unionAll _), words)
  }

  /** The learned merge table, one row per round. */
  def merges(docs: DataFrame): DataFrame = learn(docs)._1.orderBy("round")

  /** Corpus token frequencies UNDER the learned vocabulary: the final
    * dict's segmentation exploded and weighted by corpus word count — how
    * a trained BPE is applied at scale (the corpus never re-tokenizes;
    * the dict join carries the segmentation).
    */
  def tokenCounts(docs: DataFrame): DataFrame =
    learn(docs)._2
      .select(col("cnt"), explode(symsOf(col("s"))).as("token"))
      .groupBy("token")
      .agg(sum("cnt").as("n"))

  // ---- BPE APPLY: encode against the SAVED merges artifact ----

  /** Version tag of the merges derivation — bump on any change to the
    * learning constants or the artifact shape.
    */
  val MergesVersion = "bpemerges_v1"

  /** Build-once saved MERGES table of the corpus — the trained tokenizer
    * as a published artifact (the
    * [[graft.dedup.SubstringDedup.ensureSavedGramIndex]] discipline):
    * (round, left_sym, right_sym, merged, pair_count), one row per
    * learned round. Everything downstream ENCODES with this table
    * instead of re-learning.
    */
  def ensureSavedMerges(spark: org.apache.spark.sql.SparkSession, dir: String): String =
    graft.dedup.SavedArtifact.ensure(
      "graft_bpemerges",
      graft.queries.Tables.contentDigest(
        graft.queries.Tables.path(dir, "documents")),
      Seq(Rounds, EndMark, MergesVersion)) { tmp =>
      merges(graft.queries.Tables.documents(spark, dir))
        .write.mode("overwrite").parquet(tmp)
    }

  /** The saved merges in application order — a BOUNDED driver read
    * (≤ [[Rounds]] rows, the IVF-centroid discipline: a tokenizer's merge
    * table is configuration, not data; production BPE vocabularies are
    * tens of thousands of rows and ship to every task as broadcast
    * constants exactly like this).
    */
  def loadMerges(
      spark: org.apache.spark.sql.SparkSession, path: String): Seq[(String, String)] =
    spark.read.parquet(path).orderBy("round")
      .select("left_sym", "right_sym")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq

  /** Apply the merge sequence to a symbol-string column — the SAME
    * left-to-right non-overlapping `replace` per round the learner ran,
    * so encoding a corpus word reproduces the final dict's segmentation
    * exactly (the oracle exploits this: its replay applies the learned
    * recurrence and reads the final dict). All literals — one codegen'd
    * projection, no joins, no loop state.
    */
  private def applyMerges(s: Column, ms: Seq[(String, String)]): Column =
    ms.foldLeft(s) { case (acc, (l, r)) =>
      replace(acc, lit(s"|$l||$r|"), lit(s"|$l$r|"))
    }

  /** Per-word BPE token counts of the corpus VOCABULARY under a merge
    * sequence: (word, n_tok). The corpus tokenizes once into distinct
    * words (one aggregate, vocabulary-width shuffle); the encode chain
    * runs once per DISTINCT word, never per occurrence — how a trained
    * BPE is applied at scale.
    */
  def wordTokens(docs: DataFrame, ms: Seq[(String, String)]): DataFrame =
    docs
      .select(explode(Hashing.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .distinct()
      .select(
        col("word"),
        size(symsOf(applyMerges(initSymbols(col("word")), ms))).cast("long").as("n_tok"))

  /** Per-document REAL-tokenizer token counts: every word occurrence
    * joins the vocabulary dict (aggregate side — AQE broadcasts it while
    * it fits, shuffle-hash beyond; a 100 TB corpus's heavy-tailed
    * vocabulary is tens of MB either way) and sums per doc; wordless
    * docs report 0. Output: doc_id, bpe_tok — the honest unit
    * [[graft.sampling.TokenBudget]]'s whitespace proxy approximates.
    */
  def perDocTokens(docs: DataFrame, ms: Seq[(String, String)]): DataFrame = {
    val perDoc = docs
      .select(col("doc_id"), explode(Hashing.words(col("text"))).as("word"))
      .filter(col("word") =!= "")
      .join(wordTokens(docs, ms), Seq("word"))
      .groupBy("doc_id")
      .agg(sum(col("n_tok")).as("bpe_tok"))
    docs.select(col("doc_id"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("bpe_tok"), lit(0L)).as("bpe_tok"))
  }

  /** The dir-based declared-query form: per-doc counts under the SAVED
    * merges artifact.
    */
  def perDocTokensSaved(
      spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val ms = loadMerges(spark, ensureSavedMerges(spark, dir))
    perDocTokens(graft.queries.Tables.documents(spark, dir), ms)
  }

  /** Token-budget selection re-based on REAL tokenizer counts (VERDICT
    * r16 item 3): [[graft.sampling.TokenBudget.selectWith]] driven by the
    * per-doc BPE counts instead of the whitespace proxy — same
    * deterministic hash order, same integer budget arithmetic, different
    * (honest) token unit, so the kept PREFIX can differ from the proxy
    * twin's (spec-pinned).
    */
  def tokenBudgetBpe(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      num: Long = 2, den: Long = 5): DataFrame = {
    val docs = graft.queries.Tables.documents(spark, dir)
    val ms = loadMerges(spark, ensureSavedMerges(spark, dir))
    graft.sampling.TokenBudget.selectWith(
      docs.join(perDocTokens(docs, ms), Seq("doc_id")),
      col("bpe_tok"), num, den)
  }

  /** Sequence packing on REAL tokenizer counts (the [[tokenBudgetBpe]]
    * companion): the same deterministic hash-order concat-and-chunk
    * layout, pack budgets in model tokens.
    */
  def packsBpe(
      spark: org.apache.spark.sql.SparkSession, dir: String,
      packTokens: Long = SequencePacking.PackTokens): DataFrame = {
    val docs = graft.queries.Tables.documents(spark, dir)
    val ms = loadMerges(spark, ensureSavedMerges(spark, dir))
    SequencePacking.packsWith(
      docs.join(perDocTokens(docs, ms), Seq("doc_id")),
      col("bpe_tok"), packTokens)
  }

  // ---- DuckDB oracle generation (same constants, same recurrence) ----

  /** The unrolled CTE chain: wc → w0 → (p_i, b_i, w_i) × [[Rounds]],
    * WITHOUT a leading WITH.
    */
  private def learnCtes(from: String): String = {
    val base =
      s"""wc AS (
         |  SELECT word, CAST(count(*) AS BIGINT) AS cnt
         |  FROM (SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
         |        FROM $from)
         |  WHERE word <> '' GROUP BY word
         |),
         |w0 AS (SELECT word, cnt, regexp_replace(word, '(.)', '||\\1', 'g') || '||$EndMark||' AS s
         |       FROM wc)""".stripMargin
    val rounds = (1 to Rounds).map { i =>
      s"""p$i AS (
         |  SELECT l, r, CAST(sum(cnt) AS BIGINT) AS c FROM (
         |    SELECT cnt,
         |           unnest([syms[j] for j in range(1, len(syms))]) AS l,
         |           unnest([syms[j+1] for j in range(1, len(syms))]) AS r
         |    FROM (SELECT cnt, list_filter(string_split(s, '||'), x -> x <> '') AS syms
         |          FROM w${i - 1})
         |  ) GROUP BY 1, 2
         |),
         |b$i AS (SELECT l, r, c FROM p$i ORDER BY c DESC, l, r LIMIT 1),
         |w$i AS (SELECT word, cnt, replace(s, '|' || l || '||' || r || '|', '|' || l || r || '|') AS s
         |        FROM w${i - 1}, b$i)""".stripMargin
    }
    (base +: rounds).mkString(",\n")
  }

  def mergesOracleSql(from: String = "documents"): String = {
    val rows = (1 to Rounds)
      .map(i => s"SELECT $i AS round, l AS left_sym, r AS right_sym, l || r AS merged, c AS pair_count FROM b$i")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH ${learnCtes(from)}
       |SELECT * FROM (
       |  $rows
       |) ORDER BY round""".stripMargin
  }

  def tokenCountsOracleSql(from: String = "documents"): String =
    s"""WITH ${learnCtes(from)}
       |SELECT token, CAST(sum(cnt) AS BIGINT) AS n FROM (
       |  SELECT cnt, unnest(list_filter(string_split(s, '||'), x -> x <> '')) AS token
       |  FROM w$Rounds
       |) GROUP BY token ORDER BY token""".stripMargin

  /** Per-word/per-doc BPE-count CTEs over the learned recurrence's FINAL
    * dict `w[[Rounds]]` — the oracle replay of the SAVED-merges encode:
    * greedy merge application is deterministic, so applying the saved
    * table to a corpus word reproduces exactly the dict row the learner
    * left behind (engine and oracle meet at the segmentation, not at the
    * artifact file). MATERIALIZED: `dt` feeds both the final projection
    * and (in the budget twin) the cum chain.
    */
  private def perDocCtes(from: String): String =
    s"""pw AS (
       |  SELECT word,
       |         CAST(len(list_filter(string_split(s, '||'), x -> x <> '')) AS BIGINT) AS n_tok
       |  FROM w$Rounds),
       |dw AS (
       |  SELECT doc_id,
       |         unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS word
       |  FROM $from),
       |dt AS MATERIALIZED (
       |  SELECT dw.doc_id, CAST(sum(pw.n_tok) AS BIGINT) AS bpe_tok
       |  FROM dw JOIN pw USING (word) WHERE dw.word <> ''
       |  GROUP BY dw.doc_id)""".stripMargin

  def perDocTokensOracleSql(from: String = "documents"): String =
    s"""WITH ${learnCtes(from)},
       |${perDocCtes(from)}
       |SELECT d.doc_id, coalesce(dt.bpe_tok, 0) AS bpe_tok
       |FROM $from d LEFT JOIN dt USING (doc_id)
       |ORDER BY doc_id""".stripMargin

  def tokenBudgetBpeOracleSql(num: Long = 2, den: Long = 5): String = {
    import graft.sampling.TokenBudget
    s"""WITH ${learnCtes("documents")},
       |${perDocCtes("documents")},
       |bd AS (
       |  SELECT d.doc_id, coalesce(dt.bpe_tok, 0) AS btok
       |  FROM documents d LEFT JOIN dt USING (doc_id)),
       |${TokenBudget.cumCteSql(TokenBudget.Buckets, from = "bd", tokSql = "btok")},
       |lim AS (SELECT CAST(sum(tok) * $num // $den AS BIGINT) AS budget FROM tb)
       |SELECT doc_id, tok, cum FROM c, lim
       |WHERE cum <= budget ORDER BY doc_id""".stripMargin
  }

  def packsBpeOracleSql(packTokens: Long = SequencePacking.PackTokens): String = {
    import graft.sampling.TokenBudget
    s"""WITH ${learnCtes("documents")},
       |${perDocCtes("documents")},
       |bd AS (
       |  SELECT d.doc_id, coalesce(dt.bpe_tok, 0) AS btok
       |  FROM documents d LEFT JOIN dt USING (doc_id)),
       |${TokenBudget.cumCteSql(TokenBudget.Buckets, from = "bd", tokSql = "btok")}
       |SELECT doc_id, tok, cum,
       |       CAST((cum - tok) // $packTokens AS BIGINT) AS pack_id
       |FROM c ORDER BY doc_id""".stripMargin
  }
}
