package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.sampling.{MixtureResample, TokenBudget}

/** The end-to-end training-shard manifest — the whole curation story as ONE
  * declared query, proving the engine's stages COMPOSE (each is
  * individually oracle-gated; this pipeline chains them and stays
  * oracle-gated because every stage is a deterministic function of the
  * data):
  *
  *   1. '''curate''' — keep documents passing the full
  *      [[CurationPipeline]] rule chain;
  *   2. '''dedup''' — keep each distinct text's first occurrence
  *      (exact dedup over the curated survivors);
  *   3. '''mix''' — materialize the per-source training mixture
  *      ([[graft.sampling.MixtureResample]]: up-weight, down-sample, drop);
  *   4. '''pack''' — lay the replicated mixture out into fixed-token
  *      training packs ([[SequencePacking]]'s (doc_id, copy)-keyed
  *      two-level prefix sum).
  *
  * This is the query a user runs to go from a raw corpus to "which
  * document-copy goes in which training sequence" in one plan.
  *
  * Scale shape: every stage is key-partitioned or scan-fused — the verdict
  * chain's two exchanges, one md5(text) partial aggregate + id join for
  * dedup, zero shuffles for the mixture explode, and the packing core's
  * `buckets`-row shuffle + partitioned window. No collect, no global sort;
  * the id joins broadcast under AQE when the kept set is small and
  * hash-join otherwise.
  *
  * Output: doc_id, source, copy, tok, cum, pack_id.
  */
object TrainingShard {

  def manifest(
      docs: DataFrame,
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      buckets: Int = TokenBudget.Buckets): DataFrame = {
    require(packTokens > 0, s"packTokens must be positive, got $packTokens")
    // stage 1: curation keep-set (ids only — the wide verdict columns never
    // travel past the filter)
    val kept = CurationPipeline.verdicts(docs)
      .filter(col("keep")).select(col("doc_id"))
    // materialize once: curated feeds TWO diverging consumers (the
    // digest-min aggregate and the winners join) whose pruned columns
    // differ, so their canonicalized exchanges can't be reused and the
    // whole verdict chain would otherwise run twice — the same
    // shared-stage discipline manifestNearDup below applies
    val curated = docs.join(kept, "doc_id").localCheckpoint(false)
    // stage 2: exact dedup — min(doc_id) per text digest is a partial+final
    // aggregate (the CrossDocDedup argument: a mega-duplicated text
    // collapses map-side), then an id join keeps the winners
    val firstIds = curated
      .groupBy(md5(col("text")).as("__h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val unique = curated.join(firstIds, "doc_id")
    // stage 3: mixture manifest — tokenize ONCE per surviving document
    // before the replica explode (copy-invariant count; an up-weighted
    // source must cost w× rows, not w× tokenizer CPU) and carry the
    // 8-byte tok long instead of the text
    mixAndPack(unique, weightsBp, packTokens, buckets)
  }

  /** Stages 3-4 shared by [[manifest]] and [[manifestNearDup]] — tokenize
    * ONCE per surviving document before the replica explode (a
    * copy-invariant count; an up-weighted source must cost w x rows, not
    * w x tokenizer CPU), then (doc_id, copy)-keyed packing with source
    * riding as a key so the output names each replica's component without
    * a join back. One spelling, so the exact-dedup and near-dup manifests
    * can never disagree on layout.
    */
  private def mixAndPack(
      unique: DataFrame, weightsBp: Map[String, Long],
      packTokens: Long, buckets: Int): DataFrame = {
    val mixed = MixtureResample.resample(
      unique.withColumn("tok", TokenBudget.tokOfText),
      weightsBp, extraCols = Seq("tok"))
    val unit = concat(
      col("doc_id").cast("string"), lit(":"), col("copy").cast("string"))
    val (_, cum) = TokenBudget.withCumKeyed(
      mixed, buckets, Seq("doc_id", "copy", "source"), unit, tok = col("tok"))
    cum
      .withColumn("pack_id", expr(s"(cum - tok) DIV $packTokens"))
      .select(col("doc_id"), col("source"), col("copy"),
        col("tok"), col("cum"), col("pack_id"))
  }

  /** The stage CTEs (curate → dedup → mix → prefix-sum frame `c`) over an
    * arbitrary source relation — shared by [[manifestOracleSql]] and the
    * sampled twin's oracle.
    */
  private def chainCtesSql(
      weightsBp: Map[String, Long],
      buckets: Int,
      from: String): String =
    s"""curated AS (
       |  SELECT * FROM $from WHERE doc_id IN (
       |${CurationPipeline.keptIdsSql(from)}
       |  )
       |),
       |uniq AS (
       |  SELECT *, ${TokenBudget.TokOfTextSql} AS tok
       |  FROM curated WHERE doc_id IN (
       |    SELECT min(doc_id) FROM curated GROUP BY md5(text))
       |),
       |m AS (
       |${MixtureResample.manifestSql(weightsBp, extraCols = Seq("tok"), from = "uniq")}
       |),
       |${TokenBudget.cumCteSql(
           buckets, from = "m", keyCols = Seq("doc_id", "copy", "source"),
           unitSql = "CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR)",
           tokSql = "tok")}""".stripMargin

  /** DuckDB oracle for [[manifest]] — the stage CTEs chained. */
  def manifestOracleSql(
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      buckets: Int = TokenBudget.Buckets): String =
    s"""WITH ${chainCtesSql(weightsBp, buckets, "documents")}
       |SELECT doc_id, source, copy, tok, cum,
       |       CAST((cum - tok) // $packTokens AS BIGINT) AS pack_id
       |FROM c ORDER BY doc_id, copy""".stripMargin

  /** The FUZZY-dedup production variant of [[manifest]]: stage 2 swaps the
    * exact md5 first-occurrence for NEAR-duplicate connected components
    * with the quality-keep winner rule
    * ([[graft.dedup.DedupClusters.canonicalByQuality]]) — curate →
    * near-dup-dedup-keep-best → mix → pack, the full shape a
    * RefinedWeb-style production pipeline ships (fuzzy dedup after
    * filtering, best member survives). Runs over the source-carrying
    * augmented corpus ([[graft.dedup.DedupCorpus.augmentWithSource]]) so
    * the dedup stage has non-vacuous work exactly like the standalone
    * dedup queries.
    *
    * Scale shape: stage 2 adds the banded-LSH pair shuffle and the
    * conf-sized CC joins (both bounded — see the dedup scaladocs) between
    * the same id-keyed stage boundaries; everything else is [[manifest]]'s
    * plan. Output: doc_id, source, copy, tok, cum, pack_id.
    */
  def manifestNearDup(
      documents: DataFrame,
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      buckets: Int = TokenBudget.Buckets): DataFrame = {
    require(packTokens > 0, s"packTokens must be positive, got $packTokens")
    val corpus = graft.dedup.DedupCorpus.augmentWithSource(documents)
    val kept = CurationPipeline.verdicts(corpus)
      .filter(col("keep")).select(col("doc_id"))
    // FIVE consumers read the curated frame (the pair signatures, the CC
    // node set, the quality projection, and the two sides of the final
    // canon join) and each would otherwise re-run the full verdict chain —
    // measured 83 s CPU for a ~30 s plan at sf0.1. One lazy
    // localCheckpoint (the [[graft.dedup.MinHashLSH.nearDupPairs]]
    // discipline: materialized by the first consuming action, no
    // CacheManager entry, blocks freed when the plan is dropped) makes
    // every consumer read the narrow (id, text, source) rows instead.
    val curated = corpus.join(kept, "doc_id").localCheckpoint(false)
    val canon = graft.dedup.DedupClusters
      .canonicalByQuality(curated.select(col("doc_id"), col("text")))
      .select(col("canonical_id").as("doc_id"))
    val unique = curated.join(canon, "doc_id")
    mixAndPack(unique, weightsBp, packTokens, buckets)
  }

  /** DuckDB oracle for [[manifestNearDup]] — the recursive-CC canonical
    * CTEs spliced between the curation and mixture stages.
    */
  def manifestNearDupOracleSql(
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      buckets: Int = TokenBudget.Buckets): String =
    s"""WITH RECURSIVE
       |corpus0 AS (${graft.dedup.DedupCorpus.augmentWithSourceSqlFrom("documents")}),
       |curated AS (
       |  SELECT * FROM corpus0 WHERE doc_id IN (
       |${CurationPipeline.keptIdsSql("corpus0")}
       |  )
       |),
       |${graft.dedup.DedupClusters.canonicalCtesOverCorpus("curated")},
       |uniq AS (
       |  SELECT *, ${TokenBudget.TokOfTextSql} AS tok
       |  FROM curated WHERE doc_id IN (SELECT doc_id FROM canon)
       |),
       |m AS (
       |${MixtureResample.manifestSql(weightsBp, extraCols = Seq("tok"), from = "uniq")}
       |),
       |${TokenBudget.cumCteSql(
           buckets, from = "m", keyCols = Seq("doc_id", "copy", "source"),
           unitSql = "CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR)",
           tokSql = "tok")}
       |SELECT doc_id, source, copy, tok, cum,
       |       CAST((cum - tok) // $packTokens AS BIGINT) AS pack_id
       |FROM c ORDER BY doc_id, copy""".stripMargin

  /** The FULL Lee-et-al.-plus-RefinedWeb production chain (VERDICT r16
    * item 2): curate → exact-substring EXCISION (every repeated ≥40-char
    * span byte-exact-confirmed and cut, keeper copies survive —
    * [[graft.dedup.SubstringDedup.cleaned]]) → near-dup connected
    * components with the quality-keep winner rule → mixture → pack, as
    * ONE declared plan. The substring stage runs BETWEEN curation and
    * doc-level dedup, where Lee et al. apply it: excising boilerplate
    * first means the doc-level near-dup stage clusters on the UNIQUE
    * substance of each document, and the packed tokens downstream count
    * no repeated span twice. Documents whose text is entirely repeated
    * excise to empty and drop (nothing left to train on).
    *
    * Scale shape: [[manifestNearDup]]'s plan with the substring family's
    * position pipeline spliced in — the gram frame is checkpointed once
    * inside `cleaned`, the curated frame once here (the excision's three
    * text consumers + the source projection), and the cleaned corpus once
    * (the LSH signature pass and the winners join); stages still hand
    * each other id-keyed frames, and all three checkpoints are the narrow
    * (id, text, source) rows, never verdict or position columns.
    *
    * Output: doc_id, source, copy, tok, cum, pack_id.
    */
  def manifestSubstring(
      documents: DataFrame,
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      buckets: Int = TokenBudget.Buckets): DataFrame = {
    require(packTokens > 0, s"packTokens must be positive, got $packTokens")
    val corpus = graft.dedup.DedupCorpus.augmentWithSource(documents)
    val kept = CurationPipeline.verdicts(corpus)
      .filter(col("keep")).select(col("doc_id"))
    val curated = corpus.join(kept, "doc_id").localCheckpoint(false)
    val cleanedCorpus = curated.select(col("doc_id"), col("source"))
      .join(
        graft.dedup.SubstringDedup.cleaned(curated.select(col("doc_id"), col("text")))
          .filter(length(col("text_clean")) > 0),
        Seq("doc_id"))
      .select(col("doc_id"), col("text_clean").as("text"), col("source"))
      .localCheckpoint(false)
    val canon = graft.dedup.DedupClusters
      .canonicalByQuality(cleanedCorpus.select(col("doc_id"), col("text")))
      .select(col("canonical_id").as("doc_id"))
    mixAndPack(cleanedCorpus.join(canon, "doc_id"), weightsBp, packTokens, buckets)
  }

  /** DuckDB oracle for [[manifestSubstring]] — the substring-excision CTE
    * chain spliced between the curation and canonical-CC stages, every
    * stage replayed bit-for-bit (confirm step included).
    */
  def manifestSubstringOracleSql(
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      buckets: Int = TokenBudget.Buckets): String =
    s"""WITH RECURSIVE
       |corpus0 AS (${graft.dedup.DedupCorpus.augmentWithSourceSqlFrom("documents")}),
       |curated AS MATERIALIZED (
       |  SELECT * FROM corpus0 WHERE doc_id IN (
       |${CurationPipeline.keptIdsSql("corpus0")}
       |  )
       |),
       |${graft.dedup.SubstringDedup.cleanedCtesSql("curated")},
       |scorpus AS MATERIALIZED (
       |  SELECT cu.doc_id, s.text_clean AS text, cu.source
       |  FROM curated cu JOIN sclean s ON s.doc_id = cu.doc_id
       |  WHERE length(s.text_clean) > 0
       |),
       |${graft.dedup.DedupClusters.canonicalCtesOverCorpus("scorpus")},
       |uniq AS (
       |  SELECT *, ${TokenBudget.TokOfTextSql} AS tok
       |  FROM scorpus WHERE doc_id IN (SELECT doc_id FROM canon)
       |),
       |m AS (
       |${MixtureResample.manifestSql(weightsBp, extraCols = Seq("tok"), from = "uniq")}
       |),
       |${TokenBudget.cumCteSql(
           buckets, from = "m", keyCols = Seq("doc_id", "copy", "source"),
           unitSql = "CAST(doc_id AS VARCHAR) || ':' || CAST(copy AS VARCHAR)",
           tokSql = "tok")}
       |SELECT doc_id, source, copy, tok, cum,
       |       CAST((cum - tok) // $packTokens AS BIGINT) AS pack_id
       |FROM c ORDER BY doc_id, copy""".stripMargin

  /** Packs per physical shard file-set. The fixture default is tiny —
    * 4 packs × the 2 048-token budget ≈ 8 k tokens — because the sf
    * corpora are ~13 packs total and the contract (several shards, pack
    * slices contiguous) should be exercised, not vacuously one-sharded. A
    * production corpus sizes this so one shard is a few hundred MB of
    * tokenized bytes: the unit a data loader streams and a resume
    * checkpoint names.
    */
  val PacksPerShard = 4L

  /** Shard-level roll-up of [[manifest]] — the report a training run's
    * data loader is configured from: each `shard_id` names a contiguous
    * `PacksPerShard`-pack slice of the layout, with its pack count,
    * replica count, and token total. Pure arithmetic on the manifest (one
    * extra aggregate), so the composed chain stays end-to-end
    * oracle-gated; output rows are corpus-tokens / (packTokens ·
    * packsPerShard) — driver-safe at any scale.
    *
    * Output: shard_id, n_packs, n_replicas, tokens — ordered by shard_id.
    */
  def shardSummary(
      docs: DataFrame,
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      packsPerShard: Long = PacksPerShard,
      buckets: Int = TokenBudget.Buckets): DataFrame = {
    require(packsPerShard > 0, s"packsPerShard must be positive, got $packsPerShard")
    manifest(docs, weightsBp, packTokens, buckets)
      .withColumn("shard_id", expr(s"pack_id DIV $packsPerShard"))
      .groupBy(col("shard_id"))
      .agg(
        countDistinct(col("pack_id")).as("n_packs"),
        count(lit(1)).as("n_replicas"),
        sum(col("tok")).as("tokens"))
  }

  /** DuckDB oracle for [[shardSummary]] — the chain CTEs rolled up with
    * the same integer shard arithmetic.
    */
  def shardSummaryOracleSql(
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      packsPerShard: Long = PacksPerShard,
      buckets: Int = TokenBudget.Buckets): String =
    s"""WITH ${chainCtesSql(weightsBp, buckets, "documents")}
       |SELECT CAST((cum - tok) // $packTokens // $packsPerShard AS BIGINT) AS shard_id,
       |       CAST(count(DISTINCT (cum - tok) // $packTokens) AS BIGINT) AS n_packs,
       |       CAST(count(*) AS BIGINT) AS n_replicas,
       |       CAST(sum(tok) AS BIGINT) AS tokens
       |FROM c GROUP BY 1 ORDER BY shard_id""".stripMargin

  /** The universe-sampled twin of the composed pipeline — "estimate the
    * training-shard manifest of 100 TB from a pct % scan": run the SAME
    * curate → dedup → mix → pack chain over a doc-atomic
    * [[graft.sampling.UniverseSampled]] slice and Horvitz–Thompson-scale
    * the summary (each sampled doc stands in for 1/p docs; all-integer
    * ×RangeMod/pct scaling, so the answer is a pure function of the data
    * and fully oracle-gated like the other `_u10` twins).
    *
    * Doc atomicity is the right sampling unit here: every stage keys on
    * the document (curation verdicts, first-occurrence dedup, per-doc
    * copy counts, per-replica packing), so the sampled pipeline is exactly
    * the full pipeline run on the sampled universe. The dedup stage's
    * first-occurrence WINNERS can differ from the full run (the full
    * corpus's min doc_id may not be sampled) — that shifts which
    * representative survives, not how many, which is what the estimate
    * aggregates.
    *
    * Output (one row): sample_docs, est_kept_docs, sample_replicas,
    * est_replicas, sample_tokens, est_tokens, est_packs (ceiling-divided
    * by packTokens — the shard count a full materialization would need).
    */
  def manifestSampled(
      docs: DataFrame,
      pct: Int = 10,
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      buckets: Int = TokenBudget.Buckets): DataFrame = {
    val scaleN: Long = graft.sampling.UniverseSampled.scaleFor(pct)
    val sample = graft.sampling.UniverseSampled.sample(docs, col("doc_id"), pct)
    manifest(sample, weightsBp, packTokens, buckets)
      .agg(
        countDistinct(col("doc_id")).as("sample_docs"),
        count(lit(1)).as("sample_replicas"),
        sum(col("tok")).as("sample_tokens"))
      .select(
        col("sample_docs"),
        (col("sample_docs") * scaleN).as("est_kept_docs"),
        col("sample_replicas"),
        (col("sample_replicas") * scaleN).as("est_replicas"),
        col("sample_tokens"),
        (col("sample_tokens") * scaleN).as("est_tokens"),
        expr(s"(sample_tokens * $scaleN + ${packTokens - 1}) DIV $packTokens")
          .as("est_packs"))
  }

  /** DuckDB oracle for [[manifestSampled]] — the same chain over the
    * hash-range sampled slice, aggregated with the same integer scaling.
    */
  def manifestSampledOracleSql(
      pct: Int = 10,
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      buckets: Int = TokenBudget.Buckets): String = {
    val scaleN = graft.sampling.UniverseSampled.scaleFor(pct)
    s"""WITH s AS (
       |  SELECT * FROM documents
       |  WHERE ${graft.sampling.UniverseSampled.keepSql("doc_id", pct)}
       |),
       |${chainCtesSql(weightsBp, buckets, "s")}
       |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS sample_docs,
       |       CAST(count(DISTINCT doc_id) * $scaleN AS BIGINT) AS est_kept_docs,
       |       CAST(count(*) AS BIGINT) AS sample_replicas,
       |       CAST(count(*) * $scaleN AS BIGINT) AS est_replicas,
       |       CAST(sum(tok) AS BIGINT) AS sample_tokens,
       |       CAST(sum(tok) * $scaleN AS BIGINT) AS est_tokens,
       |       CAST((sum(tok) * $scaleN + ${packTokens - 1}) // $packTokens AS BIGINT)
       |         AS est_packs
       |FROM c""".stripMargin
  }
}
