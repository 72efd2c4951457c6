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
    val curated = docs.join(kept, "doc_id")
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
    val mixed = MixtureResample.resample(
      unique.withColumn("tok", TokenBudget.tokOfText),
      weightsBp, extraCols = Seq("tok"))
    // stage 4: (doc_id, copy)-keyed packing; source rides as a key so the
    // output names each replica's component without a join back
    val unit = concat(
      col("doc_id").cast("string"), lit(":"), col("copy").cast("string"))
    val (_, cum) = TokenBudget.withCumKeyed(
      mixed, buckets, Seq("doc_id", "copy", "source"), unit, tok = col("tok"))
    cum
      .withColumn("pack_id", expr(s"(cum - tok) DIV $packTokens"))
      .select(col("doc_id"), col("source"), col("copy"),
        col("tok"), col("cum"), col("pack_id"))
  }

  /** DuckDB oracle for [[manifest]] — the stage CTEs chained. */
  def manifestOracleSql(
      weightsBp: Map[String, Long] = MixtureResample.DefaultWeightsBp,
      packTokens: Long = SequencePacking.PackTokens,
      buckets: Int = TokenBudget.Buckets): String =
    s"""WITH curated AS (
       |  SELECT * FROM documents WHERE doc_id IN (
       |${CurationPipeline.keptIdsSql}
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
           tokSql = "tok")}
       |SELECT doc_id, source, copy, tok, cum,
       |       CAST((cum - tok) // $packTokens AS BIGINT) AS pack_id
       |FROM c ORDER BY doc_id, copy""".stripMargin
}
