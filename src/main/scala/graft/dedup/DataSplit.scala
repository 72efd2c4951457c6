package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-free train/validation/test splitting — CLUSTER-ATOMIC by the
  * near-dup component, not per document.
  *
  * The standard failure a per-doc split ships at 100 TB: a validation
  * document's near-duplicate (boilerplate-wrapped copy, truncated mirror,
  * republished scrape) lands in train, and the eval silently measures
  * memorization. The fix is to make the split decision a function of the
  * near-dup CLUSTER: every member of a connected component inherits one
  * verdict, so no [[MinHashLSH.nearDupPairs]] edge can ever straddle a
  * split boundary (pinned by DataSplitSpec over the full pair table; the
  * same discipline as deduplicate-then-split, but it also covers
  * pipelines that keep all near-dup members, e.g. for dedup-rate studies).
  *
  * The verdict itself is a deterministic salted hash of the cluster
  * representative against basis-point thresholds ([[TrainBp]]/[[ValBp]]
  * out of [[Mod]]) — the [[graft.sampling.UniverseSampled]] discipline
  * applied to assignment rather than sampling. Consequences: re-runs,
  * re-shards, and retries over the SAME snapshot reproduce the same
  * split, and the whole assignment replays bit-exactly in the DuckDB
  * oracle.
  *
  * Cross-snapshot stability is conditional and must be stated precisely:
  * a new member JOINING a cluster inherits its verdict only while the
  * cluster's min-id representative is unchanged. A newcomer with a
  * smaller id (or a bridging document merging two clusters) RE-KEYS the
  * representative and can flip the whole cluster's verdict — so a
  * production pipeline that has already shipped an eval set must not
  * re-derive the split from scratch on the next snapshot; it PERSISTS the
  * assignment table and lets new documents inherit by joining any saved
  * member of their cluster ([[graft.dedup.IncrementalDedup]]'s saved-index
  * discipline), hashing only clusters with no saved member. Within one
  * snapshot the leakage-free property is unconditional (no pair straddles
  * a boundary — spec-pinned).
  *
  * Scale shape: the components come from the probed CC machinery
  * ([[DedupClusters.components]], id-keyed joins, lineage-truncated
  * iterations); the verdict is ONE md5 on the representative id — a
  * scan-fused projection, no extra shuffle; the summary is a 3-row
  * aggregate. Nothing here shuffles text.
  */
object DataSplit {

  /** Basis points (out of [[Mod]]) routed to train; the next [[ValBp]] to
    * validation; the remainder to test — 90/5/5.
    */
  val TrainBp = 9000
  val ValBp = 500
  val Mod = 10000L

  private val Salt = "split:"

  /** The deterministic verdict for a cluster representative id. */
  def splitCol(rep: Column): Column = {
    val h = Hashing.hash60(concat(lit(Salt), rep.cast("string"))) % Mod
    when(h < TrainBp, "train")
      .when(h < TrainBp + ValBp, "val")
      .otherwise("test")
  }

  /** SQL text of [[splitCol]] over a representative-id expression. */
  def splitSql(repExpr: String): String = {
    val h = s"${Hashing.hash60Sql(s"'$Salt' || CAST($repExpr AS VARCHAR)")} % $Mod"
    s"CASE WHEN $h < $TrainBp THEN 'train' " +
      s"WHEN $h < ${TrainBp + ValBp} THEN 'val' ELSE 'test' END"
  }

  /** Cluster-atomic assignment over the corpus's MinHash near-dup graph.
    * Output: doc_id, cluster_rep, split.
    */
  def assign(corpus: DataFrame): DataFrame =
    assignWithPairs(corpus, MinHashLSH.nearDupPairs(MinHashLSH.signatures(corpus)))

  /** [[assign]] with an injected pair graph (the
    * [[DedupClusters.cleanedWithPairs]] seam: the split layer is
    * pair-source-agnostic, and the scale probe can drive it with synthetic
    * skew).
    */
  def assignWithPairs(corpus: DataFrame, pairs: DataFrame): DataFrame =
    DedupClusters.components(corpus, pairs)
      .select(
        col("doc_id"),
        col("rep").as("cluster_rep"),
        splitCol(col("rep")).as("split"))

  /** Per-split audit roll-up a pipeline logs next to the shipped corpus:
    * split, n_docs, n_clusters, n_chars. The char mass rides an id-keyed
    * join of the (id, length) projection to the assignment — text itself
    * never shuffles.
    */
  def summary(corpus: DataFrame): DataFrame =
    assign(corpus)
      .join(
        corpus.select(col("doc_id"), length(col("text")).cast("long").as("__len")),
        Seq("doc_id"))
      .groupBy(col("split"))
      .agg(
        count(lit(1)).as("n_docs"),
        countDistinct(col("cluster_rep")).as("n_clusters"),
        sum(col("__len")).as("n_chars"))
      .orderBy(col("split"))

  /** DuckDB oracle for [[assign]] over the augmented corpus: the shared
    * recursive-reachability clusters + the same salted-hash verdict.
    */
  def assignOracleSql: String =
    DedupClusters.reachCtes +
      s""",
         |dec AS (SELECT node AS doc_id, min(label) AS rep FROM reach GROUP BY node)
         |SELECT doc_id, rep AS cluster_rep, ${splitSql("rep")} AS split
         |FROM dec ORDER BY doc_id""".stripMargin

  /** DuckDB oracle for [[summary]]. */
  def summaryOracleSql: String =
    DedupClusters.reachCtes +
      s""",
         |dec AS (SELECT node AS doc_id, min(label) AS rep FROM reach GROUP BY node),
         |a AS (SELECT dec.doc_id, dec.rep, ${splitSql("rep")} AS split,
         |             CAST(length(c.text) AS BIGINT) AS len
         |      FROM dec JOIN corpus c ON c.doc_id = dec.doc_id)
         |SELECT split, count(*) AS n_docs,
         |       count(DISTINCT rep) AS n_clusters,
         |       CAST(sum(len) AS BIGINT) AS n_chars
         |FROM a GROUP BY split ORDER BY split""".stripMargin
}
