package graft.similarity

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Semantic deduplication — drop documents whose EMBEDDING is close to a
  * cluster representative's, even when no token overlaps (translated
  * boilerplate, paraphrased spam, re-rendered templates); the pass SemDeDup
  * (Abbas et al. 2023, "SemDeDup: Data-efficient learning at web-scale
  * through semantic deduplication") runs after lexical dedup. Their recipe
  * clusters with k-means and drops within-cluster points above a cosine
  * threshold; this variant keeps the decision DETERMINISTIC by clustering
  * with the existing sign-LSH bucketing ([[SimilaritySearch]]'s md5-parity
  * Rademacher planes) and comparing each vector to its bucket's
  * representative (smallest vec_id) — a pure function of the data, so the
  * DuckDB oracle replays every keep/drop decision bit-exactly, where a
  * k-means fit ([[IvfIndex]]) is engine-specific and can only be
  * rows-only checked.
  *
  * Decision rule: keep a vector iff it IS its bucket's representative or
  * its quantized cosine to the representative is below [[MinSim]].
  *
  * Scale shape: one scan of the corpus computes (qv, nrm, bucket); the
  * representative table is ONE ROW PER BUCKET (2^planes rows — plan-time
  * constant, grown via the `numPlanes` knob as the corpus grows), so both
  * joins below are broadcasts and the only exchange is the tiny
  * partial-aggregated min-per-bucket. No all-pairs stage, no window over
  * the corpus, no k-means iterations: at 100 TB this is a scan plus
  * broadcast probes. (Against SemDeDup's k-means: LSH buckets are coarser
  * cluster proxies — the standard recall/determinism trade the rest of the
  * dedup layer already makes, cf. [[SimHash]].)
  */
object SemanticDedup {

  /** Fixed-plane fallback for pinned configurations: 8 → 256 buckets. The
    * DEFAULT path now derives the width from the live corpus count
    * ([[PlaneBudget.bandBits]], r14) so cluster granularity tracks the
    * population — with a fixed width, bucket population grows linearly
    * and the single representative becomes an ever-coarser cluster proxy
    * (cost stays linear either way: one rep compare per vector; this knob
    * is about DECISION quality, not join work).
    */
  val NumPlanes = 8

  /** Drop threshold: quantized cosine to the bucket representative. */
  val MinSim = 0.15

  private def bucketCol(qv: Column, numPlanes: Int): Column =
    // single-band key from the loop-codegen [[graft.functions.SignBandKeys]]
    // — the per-plane unroll grew the generated method with the derived
    // width past HotSpot's huge-method JIT threshold (see that scaladoc)
    graft.functions.SignBandKeys
      .bandKeys(qv, SimilaritySearch.signsFor(numPlanes), 1)
      .getItem(0)

  /** Per-vector keep/drop decisions: vec_id, bucket, rep_id, sim (to the
    * representative), keep.
    */
  def decisions(
      embeddings: DataFrame,
      minSim: Double = MinSim,
      numPlanes: Option[Int] = None): DataFrame = {
    val planes = numPlanes.getOrElse(PlaneBudget.bandBitsFor(embeddings))
    val qv = SimilaritySearch.quantize(col("embedding"))
    // prep feeds THREE plan branches (rep-id agg, rep-vector lookup, final
    // probe); without materialization each branch rescans the corpus and
    // re-runs the numPlanes 64-dim plane dots per row — the same
    // triple-compute [[SimilaritySearch.nearDupPairs]] eliminates with a
    // lazy localCheckpoint, applied identically here
    val base = graft.queries.Tables.parallelismFloor(embeddings)
      .select(col("vec_id"), qv.as("qv"))
      .withColumn("nrm", sqrt(SimilaritySearch.dotQ(col("qv"), col("qv")).cast("double")))
    val prep = base
      .filter(col("nrm") > 0)
      .withColumn("bucket", bucketCol(col("qv"), planes))
      .localCheckpoint(false)
    // zero-norm vectors (degenerate/empty docs whose embedding quantizes
    // to all zeros) have no angle and can never be near-duplicates:
    // KEEP them explicitly rather than omitting their decision row — a
    // consumer materializing the deduped corpus as keep-joined-to-corpus
    // would otherwise silently delete the documents (review finding;
    // mirrored in the oracle, so the omission was gate-invisible)
    val zeroNorm = base
      .filter(!(col("nrm") > 0))
      .select(col("vec_id"), lit(null).cast("long").as("bucket"),
        col("vec_id").as("rep_id"),
        lit(null).cast("double").as("sim"), // no angle exists — honest NULL
        lit(true).as("keep"))
    // reps keeps ONLY rep_id: the representative row's own bucket column
    // (from prep) identifies the bucket after the join, and carrying the
    // groupBy key would make `bucket` ambiguous in the self-join lineage
    val reps = prep.groupBy(col("bucket")).agg(min(col("vec_id")).as("rep_id"))
      .select(col("rep_id"))
    val repVecs = prep
      .join(broadcast(reps), col("vec_id") === col("rep_id"))
      .select(col("rep_id"), col("bucket").as("rep_bucket"),
        col("qv").as("rep_qv"), col("nrm").as("rep_nrm"))
    val sim = SimilaritySearch.dotQ(col("qv"), col("rep_qv")).cast("double") /
      (col("nrm") * col("rep_nrm"))
    // NO broadcast hint on repVecs: one full 64-long vector per non-empty
    // bucket is corpus-dependent (~n/64 rows up to the 2^MaxBits cap,
    // hundreds of MB at the cap) — the SharedSpans rule: never force-
    // broadcast a growing set; AQE still broadcasts it while small, and
    // past the threshold the bucket-equi shuffle join is the right plan
    prep
      .join(repVecs, col("bucket") === col("rep_bucket"))
      .select(col("vec_id"), col("bucket"), col("rep_id"), sim.as("sim"),
        (col("vec_id") === col("rep_id") || sim < minSim).as("keep"))
      .unionAll(zeroNorm)
  }

  /** DuckDB oracle for [[decisions]] with the DERIVED width: the dynamic
    * count→width→signs chain of [[PlaneBudget.dynamicBandsSql]] at
    * `numBands = 1` — its single band's `key` IS this operator's bucket
    * (bit i = plane i), so the self-sizing clustering replays at whatever
    * corpus size the oracle is pointed at.
    */
  def decisionsOracleSql(minSim: Double = MinSim): String = {
    def dotSql(a: String, b: String): String = SimilaritySearch.dotSql(a, b)
    s"""WITH ${PlaneBudget.dynamicBandsSql(1, withLabel = false)},
       |bk AS (SELECT vec_id, key AS bucket FROM bands),
       |reps AS (SELECT bucket, min(vec_id) AS rep_id FROM bk GROUP BY bucket),
       |repv AS (
       |  SELECT r.bucket, r.rep_id, p.qv AS rep_qv, p.nrm AS rep_nrm
       |  FROM reps r JOIN prep p ON p.vec_id = r.rep_id
       |)
       |SELECT * FROM (
       |  SELECT p.vec_id, b.bucket, v.rep_id,
       |         ${dotSql("p.qv", "v.rep_qv")} / (p.nrm * v.rep_nrm) AS sim,
       |         (p.vec_id = v.rep_id
       |          OR ${dotSql("p.qv", "v.rep_qv")} / (p.nrm * v.rep_nrm) < $minSim) AS keep
       |  FROM prep p
       |  JOIN bk b ON b.vec_id = p.vec_id
       |  JOIN repv v ON b.bucket = v.bucket
       |  UNION ALL
       |  SELECT vec_id, CAST(NULL AS BIGINT) AS bucket, vec_id AS rep_id,
       |         CAST(NULL AS DOUBLE) AS sim, true AS keep
       |  FROM prep0 WHERE NOT (nrm > 0)
       |)
       |ORDER BY vec_id""".stripMargin
  }
}
