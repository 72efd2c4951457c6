package graft.similarity

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-label embedding centroids in exact integer arithmetic — the
  * aggregation primitive under k-means ([[IvfIndex]] recomputes exactly
  * this per iteration) and under class-prototype / nearest-centroid
  * classification, exposed as a declared oracle-gated query.
  *
  * Shape: `posexplode` each quantized vector into (dim, q) rows, then one
  * hash aggregate on (label, dim). The shuffle carries only
  * |labels|·dims partial rows after map-side combine — at 100 TB the
  * explode is pipelined inside the scan stage (codegen'd generator, no
  * materialized blow-up) and the aggregate state is bounded by
  * labels × dims, not by row count. The HOF alternative (per-partition
  * `zip_with` array sums) removes the explode but runs interpreted per
  * element — measured 7× slower on the MinHash signatures, so the
  * explode+agg form is deliberate (SURVEY §6).
  *
  * Output keeps integer sums and counts (`sum_q`, `n`) rather than float
  * means: exact in both engines; the consumer divides.
  */
object EmbeddingCentroids {

  /** Output: label, dim (0-based), sum_q (Σ round(x·1000)), n. */
  def centroids(embeddings: DataFrame): DataFrame =
    graft.queries.Tables.parallelismFloor(embeddings)
      .select(
        col("label"),
        posexplode(SimilaritySearch.quantize(col("embedding"))))
      .select(col("label"), col("pos").cast("long").as("dim"), col("col").as("q"))
      .groupBy(col("label"), col("dim"))
      .agg(sum(col("q")).as("sum_q"), count(lit(1)).as("n"))

  /** Fixture embedding width (TESTDATA.md: 64-dim vectors) — the oracle's
    * dimension range is static SQL, so it names the width explicitly.
    */
  val Dims = 64

  def centroidsOracleSql(dims: Int = Dims): String =
    // the dim range is bounded by each row's ACTUAL array length, exactly
    // like posexplode: a NULL or short embedding contributes no rows past
    // its length, so `n` counts real contributions — an unconditional
    // CROSS JOIN would count every row at all dims and silently dilute
    // any mean a consumer divides out (review finding; Spark and oracle
    // agreed only while every fixture vector was dense and full-width)
    s"""SELECT label, CAST(i - 1 AS BIGINT) AS dim,
       |       CAST(sum(CAST(round(CAST(embedding[i] AS DOUBLE) * ${SimilaritySearch.Scale}) AS BIGINT)) AS BIGINT) AS sum_q,
       |       count(*) AS n
       |FROM embeddings CROSS JOIN (SELECT unnest(range(1, ${dims + 1})) AS i) t
       |WHERE embedding IS NOT NULL AND i <= len(embedding)
       |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin
}
