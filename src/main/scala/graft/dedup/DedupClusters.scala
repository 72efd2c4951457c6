package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The dedup DECISION layer: near-duplicate pairs → connected components →
  * one surviving representative per cluster. Pair detection (MinHash et al.)
  * only yields edges; a real pipeline must then pick winners transitively —
  * if A~B and B~C, exactly one of {A,B,C} survives even though A~C was
  * never tested.
  *
  * Algorithm: iterative min-label propagation on the undirected pair graph
  * (labels start as doc_id; each round every node takes the min label in
  * its closed neighborhood; stop when no label changes). Deterministic,
  * converges in O(component diameter) rounds — near-dup components are
  * shallow (dups of dups), so a handful of joins. Each round is one
  * shuffle on node id; at 100 TB scale the standard upgrade is the
  * large-star/small-star CC algorithm (Kiveris et al., "Connected
  * Components in MapReduce and Beyond", SoCC 2014), same join shape with
  * alternation — the per-round plan here is exactly that building block.
  */
object DedupClusters {

  val MaxIterations = 20

  /** Edge-shuffle width: follow the session's shuffle sizing (the knob an
    * operator owns on a real cluster) rather than a hardcoded constant —
    * right at local[32]/sf0.1 AND at 1000 executors, where the job config
    * sizes `spark.sql.shuffle.partitions` to the data.
    */
  def edgePartitions(spark: org.apache.spark.sql.SparkSession): Int =
    spark.sessionState.conf.numShufflePartitions

  /** (node, rep) for every doc in `corpus`, where rep is the smallest
    * doc_id in the node's connected component of the `pairs` graph
    * (doc_a, doc_b columns). Singletons map to themselves.
    *
    * Throws if label propagation has not reached a fixed point after
    * [[MaxIterations]] rounds (component diameter > MaxIterations): a
    * silent stop there would return representatives that disagree with the
    * exact reachability oracle — fail loudly instead.
    */
  def components(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val nodes = corpus.select(col("doc_id").as("node"))
    // closed-neighborhood edges: both directions + self-loop, pre-shuffled
    // once on the join key so the per-iteration joins reuse the layout.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .unionAll(nodes.select(col("node").as("src"), col("node").as("dst")))
      .repartition(edgePartitions(corpus.sparkSession), col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // localCheckpoint (not persist): iterative plans otherwise NEST — round
    // k's logical plan contains rounds 1..k-1, so analysis cost and driver
    // memory grow with iteration count and deep components OOM the driver.
    // Checkpointing truncates lineage to the materialized result each
    // round — the standard shape for iterative graph algorithms on Spark.
    // LAZY (r18): the initial labelSum below is the action that
    // materializes it — an eager checkpoint here ran one extra job (and
    // one extra corpus scan) per components() call for nothing.
    var labels = nodes.select(col("node"), col("node").as("label")).localCheckpoint(false)
    // Convergence via Σlabel: min-propagation only ever DECREASES labels,
    // so an unchanged sum ⟺ a fixed point — one cheap in-memory action per
    // iteration instead of a change-detection join + count. Summed as
    // decimal(38,0): a long sum could overflow at corpus scale and in
    // principle fake a fixed point.
    def labelSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum(col("label").cast("decimal(38,0)"))).head().getDecimal(0)
    var prevSum = labelSum(labels) // null ⇔ empty corpus (sum over no rows)
    var converged = prevSum == null // zero nodes IS the fixed point
    var iter = 0
    // try/finally: a failed iteration job (lost executor, OOM) must not
    // leak the MEMORY_AND_DISK edge multiset into the CacheManager for the
    // session's lifetime — the no-residue contract the persist was
    // originally scoped under
    try {
      while (!converged && iter < MaxIterations) {
        // lazy checkpoint: the convergence-sum action below is the job that
        // materializes it, so each round costs ONE job, not two (an eager
        // checkpoint would run its own), while still truncating lineage
        val next = edges
          .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
          .groupBy(col("src").as("node"))
          .agg(min(col("label")).as("label"))
          .localCheckpoint(false)
        val newSum = labelSum(next)
        labels = next
        converged = newSum.compareTo(prevSum) == 0
        prevSum = newSum
        iter += 1
      }
    } finally edges.unpersist()
    // stderr, not stdout (the bench/driver parse stdout as JSON): one line
    // per CC run so a bench-time drift can be checked against round count
    System.err.println(s"DedupClusters.components: $iter rounds, converged=$converged")
    if (!converged)
      throw new IllegalStateException(
        s"DedupClusters: no fixed point after $MaxIterations rounds " +
          "(component diameter exceeds MaxIterations)")
    labels.select(col("node").as("doc_id"), col("label").as("rep"))
  }

  /** Iteration cap for [[componentsBigStar]]: star contraction halves a
    * potential function every alternation (Kiveris et al., SoCC 2014,
    * Thm 5.1 — O(log² n) worst case, O(log n) observed), so 40 rounds
    * covers any corpus that fits in storage; hitting the cap means a bug,
    * not a deep graph, and throws like the min-label loop does.
    */
  val MaxStarRounds = 40

  /** Alternative CC strategy: LARGE-STAR / SMALL-STAR alternation
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014) — the scaladoc's own named upgrade path for [[components]].
    * Min-label propagation needs O(component diameter) rounds, which is
    * fine for shallow near-dup clusters but degrades on chain-shaped
    * components (A~B~C~… with no short-cuts); star contraction converges
    * in O(log d) alternations because each round re-points nodes at their
    * neighborhood minimum, halving every path.
    *
    * Per alternation: two half-rounds, each a conf-partitioned
    * `groupBy(u).agg(min(v))` (map-side combining — a mega-star center
    * costs one long per map partition) followed by an id-keyed join that
    * fans out one row per edge. No neighborhood is ever materialized as a
    * list, so a 10⁸-member cluster is just 10⁸ rows spread across the
    * shuffle, and AQE's skew split handles the one hot join partition a
    * giant star center creates. Edge multiset is `distinct`-ed per
    * half-round (star contraction collapses parallel edges fast, so the
    * working set SHRINKS monotonically — the property that makes this the
    * 100 TB choice).
    *
    * Convergence: Σ(u+v) over the canonical edge list as decimal(38,0).
    * Both stars only ever re-point an edge end at a smaller label, so the
    * sum is non-increasing per edge and strictly drops when anything
    * changes (dedup removals only drop it further) — an unchanged sum
    * across a full alternation ⟺ the edge set is a fixed point, i.e. a
    * forest of stars centered at each component's minimum id. One cheap
    * action per alternation, same pattern as [[components]]'s label sum.
    *
    * Returns (labels, alternations): labels is (doc_id, rep) like
    * [[components]]; bit-identical output (both strategies are
    * deterministic and converge to min-id representatives), so the
    * `dedup_clusters` DuckDB oracle gates this path too
    * (`dedup_clusters_bigstar`).
    */
  def componentsBigStar(corpus: DataFrame, pairs: DataFrame): (DataFrame, Int) = {
    val spark = corpus.sparkSession
    val nParts = edgePartitions(spark)
    val nodes = corpus.select(col("doc_id").as("node"))
    // canonical undirected edges: (u = max, v = min), self-loops dropped
    var edges = pairs
      .select(greatest(col("doc_a"), col("doc_b")).as("u"),
              least(col("doc_a"), col("doc_b")).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .repartition(nParts, col("u"))
      .localCheckpoint(false)

    // m(u) = min of the closed neighborhood of u over `directed`
    def neighborhoodMin(directed: DataFrame): DataFrame =
      directed.groupBy("u").agg(min(col("v")).as("mn"))
        .select(col("u"), least(col("mn"), col("u")).as("m"))

    // large-star: key BOTH directions; emit (v, m) for neighbors v > u.
    // v > u ≥ m keeps the output canonical with no self-loops.
    def largeStar(e: DataFrame): DataFrame = {
      val directed = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      directed.join(neighborhoodMin(directed), Seq("u"))
        .where(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v"))
        .distinct()
    }

    // small-star: key the LARGER endpoint (canonical order already does
    // this); emit (v, m) for neighbors v ≠ m, plus (u, m).
    def smallStar(e: DataFrame): DataFrame = {
      val mm = neighborhoodMin(e)
      e.join(mm, Seq("u"))
        .where(col("v") =!= col("m"))
        .select(col("v").as("u"), col("m").as("v"))
        .unionAll(mm.select(col("u"), col("m").as("v")))
        .filter(col("u") =!= col("v"))
        .distinct()
    }

    def edgeSum(df: DataFrame): java.math.BigDecimal =
      df.agg(sum((col("u") + col("v")).cast("decimal(38,0)"))).head().getDecimal(0)

    var prevSum = edgeSum(edges) // null ⇔ no edges at all
    var converged = prevSum == null
    var iter = 0
    while (!converged && iter < MaxStarRounds) {
      val next = smallStar(largeStar(edges).localCheckpoint(false)).localCheckpoint(false)
      val newSum = edgeSum(next)
      edges = next
      converged = newSum == null || newSum.compareTo(prevSum) == 0
      prevSum = newSum
      iter += 1
    }
    System.err.println(s"DedupClusters.componentsBigStar: $iter alternations, converged=$converged")
    if (!converged)
      throw new IllegalStateException(
        s"DedupClusters.componentsBigStar: no fixed point after $MaxStarRounds alternations")
    // fixed point = star forest: every non-min member carries exactly one
    // edge (member, component-min); singletons label themselves
    val labels = nodes
      .join(edges.select(col("u").as("node"), col("v").as("star_rep")), Seq("node"), "left")
      .select(col("node").as("doc_id"), coalesce(col("star_rep"), col("node")).as("rep"))
    (labels, iter)
  }

  /** Dedup verdict per doc: its cluster representative and whether it
    * survives (is the representative).
    */
  def decisions(corpus: DataFrame, pairs: DataFrame): DataFrame =
    components(corpus, pairs)
      .select(col("doc_id"), col("rep"), (col("doc_id") === col("rep")).as("keep"))

  /** [[decisions]] computed with the [[componentsBigStar]] strategy —
    * same output, O(log d) rounds instead of O(d).
    */
  def decisionsBigStar(corpus: DataFrame, pairs: DataFrame): DataFrame =
    componentsBigStar(corpus, pairs)._1
      .select(col("doc_id"), col("rep"), (col("doc_id") === col("rep")).as("keep"))

  /** THE END-TO-END DEDUP PIPELINE: corpus → MinHash signatures → banded
    * candidate pairs → connected components → surviving documents. This is
    * the query a training-data pipeline actually ships — everything else in
    * the dedup package is a stage of it. Output: surviving (doc_id,
    * content_hash); the join back to the corpus is on doc_id (the shuffle
    * carries ids + digests, never text).
    */
  def cleaned(corpus: DataFrame): DataFrame =
    cleanedWithPairs(corpus, MinHashLSH.nearDupPairs(MinHashLSH.signatures(corpus)))

  /** [[cleaned]] with an injected pair graph — the decision layer is
    * pair-source-agnostic (MinHash, SimHash, embedding or synthetic edges
    * all yield (doc_a, doc_b)), and the scale probe uses this seam to
    * drive the CC edge shuffle with a power-law component (one mega-star
    * holding ~10 % of docs) that the MinHash path's bucket cap
    * (NumBands × MaxBucket ⇒ degree ≤ 512) deliberately never produces.
    */
  def cleanedWithPairs(corpus: DataFrame, pairs: DataFrame): DataFrame =
    corpus
      .join(decisions(corpus, pairs).filter(col("keep")), Seq("doc_id"))
      .select(col("doc_id"), md5(col("text")).as("content_hash"))

  /** QUALITY-AWARE canonical selection: keep the HIGHEST-quality member of
    * each near-dup cluster (ties broken by smallest doc_id) instead of
    * [[cleaned]]'s min-id representative. This is what production corpus
    * dedup actually wants — near-dup clusters typically contain one clean
    * original and N boilerplate-wrapped or truncated copies, and min-id
    * keeps an arbitrary one (SlimPajama/RefinedWeb-style pipelines keep a
    * best member; the quality signal here is
    * [[graft.text.TextAnalysis.qualityScore]]).
    *
    * Plan shape: components (id-keyed joins) × quality (fused per-row
    * projection) joined on doc_id, then ONE groupBy on the cluster
    * representative — `max(struct(quality, -doc_id))` is an argmax that
    * combines map-side, so the shuffle carries one (double, long) pair per
    * cluster per partition, never text. The struct-typed buffer makes this
    * a SortAggregate rather than HashAggregate (Spark hash-aggregates only
    * mutable primitive buffers) — a deliberate trade: the partial sort runs
    * over 24-byte (rep, quality, doc_id) rows and still collapses map-side,
    * whereas the hash-friendly spelling (max-quality pass + join-back +
    * min-id pass) costs a second exchange over the same rows plus a
    * double-keyed self-join. Output: cluster_rep, canonical_id, quality,
    * n_members.
    */
  def canonicalByQuality(corpus: DataFrame): DataFrame =
    canonicalByQualityWithPairs(
      corpus, MinHashLSH.nearDupPairs(MinHashLSH.signatures(corpus)))

  /** [[canonicalByQuality]] with an injected pair graph (see
    * [[cleanedWithPairs]] for why the seam exists).
    */
  def canonicalByQualityWithPairs(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val quality = graft.text.TextAnalysis.qualityScore(corpus)
      .select(col("doc_id"), col("quality"))
    components(corpus, pairs)
      .join(quality, Seq("doc_id"))
      .groupBy(col("rep").as("cluster_rep"))
      .agg(
        max(struct(col("quality"), (-col("doc_id")).as("negid"))).as("__best"),
        count(lit(1)).as("n_members"))
      .select(
        col("cluster_rep"),
        (-col("__best.negid")).as("canonical_id"),
        col("__best.quality").as("quality"),
        col("n_members"))
  }

  /** Oracle SQL for [[canonicalByQuality]]: the same recursive-reachability
    * clusters joined to the quality formula, argmax spelled as a
    * row_number window (quality DESC, doc_id ASC) — equivalent to the
    * Spark `max(struct(quality, -doc_id))` because both engines compute
    * the quality double with identical IEEE operations (the basis of the
    * hash-matched `text_quality` row).
    */
  def canonicalByQualityOracleSql: String = {
    val qualityInner = graft.text.TextAnalysis
      .qualityScoreOracleSql(from = "corpus", ordered = false)
    reachCtes +
      s""",
         |dec AS (SELECT node AS doc_id, min(label) AS rep FROM reach GROUP BY node),
         |q AS ($qualityInner),
         |m AS (SELECT dec.rep, q.doc_id, q.quality
         |      FROM dec JOIN q ON dec.doc_id = q.doc_id)
         |SELECT rep AS cluster_rep, doc_id AS canonical_id, quality, n_members
         |FROM (SELECT m.*,
         |             count(*) OVER (PARTITION BY rep) AS n_members,
         |             row_number() OVER (PARTITION BY rep
         |                                ORDER BY quality DESC, doc_id) AS rn
         |      FROM m)
         |WHERE rn = 1 ORDER BY cluster_rep""".stripMargin
  }

  /** END-TO-END quality-keep dedup: the [[cleaned]] pipeline with
    * [[canonicalByQuality]]'s winner rule — every near-dup cluster
    * surfaces its best-quality member's document, not its min-id one.
    * Same scale shape as [[cleaned]]: the canonical-id set is
    * cluster-cardinality, and the join back to the corpus is id-keyed
    * (ids + digests shuffle, never text).
    */
  def cleanedByQuality(corpus: DataFrame): DataFrame =
    corpus
      .join(
        canonicalByQuality(corpus).select(col("canonical_id").as("doc_id")),
        Seq("doc_id"))
      .select(col("doc_id"), md5(col("text")).as("content_hash"))

  /** Oracle SQL for [[cleanedByQuality]]. */
  def cleanedByQualityOracleSql: String = {
    val qualityInner = graft.text.TextAnalysis
      .qualityScoreOracleSql(from = "corpus", ordered = false)
    reachCtes +
      s""",
         |dec AS (SELECT node AS doc_id, min(label) AS rep FROM reach GROUP BY node),
         |q AS ($qualityInner),
         |canon AS (
         |  SELECT doc_id FROM (
         |    SELECT q.doc_id,
         |           row_number() OVER (PARTITION BY dec.rep
         |                              ORDER BY q.quality DESC, q.doc_id) AS rn
         |    FROM dec JOIN q ON dec.doc_id = q.doc_id)
         |  WHERE rn = 1
         |)
         |SELECT c.doc_id, md5(c.text) AS content_hash
         |FROM corpus c JOIN canon ON c.doc_id = canon.doc_id
         |ORDER BY c.doc_id""".stripMargin
  }

  /** CTE fragments (NO `WITH` prefix — the caller's chain must open with
    * `WITH RECURSIVE`) computing the quality-keep canonical id set over an
    * arbitrary corpus CTE named `corpusName` (doc_id, text): pairs →
    * edges → recursive reach → clusters → quality → `canon(doc_id)`.
    * The embeddable form of [[cleanedByQualityOracleSql]]'s chain, for
    * pipelines that dedup mid-stream ([[graft.text.TrainingShard
    * .manifestNearDup]]).
    */
  def canonicalCtesOverCorpus(corpusName: String): String = {
    val pairsSql = MinHashLSH.nearDupPairsOracleSqlCorpus(
      s"SELECT doc_id, text FROM $corpusName")
    val qualityInner = graft.text.TextAnalysis
      .qualityScoreOracleSql(from = corpusName, ordered = false)
    s"""pairs AS ($pairsSql),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs
       |  UNION ALL SELECT doc_id, doc_id FROM $corpusName
       |),
       |reach(node, label) AS (
       |  SELECT doc_id, doc_id FROM $corpusName
       |  UNION
       |  SELECT e.src, r.label
       |  FROM reach r JOIN edges e ON e.dst = r.node
       |),
       |dec AS (SELECT node AS doc_id, min(label) AS rep FROM reach GROUP BY node),
       |q AS ($qualityInner),
       |canon AS (
       |  SELECT doc_id FROM (
       |    SELECT q.doc_id,
       |           row_number() OVER (PARTITION BY dec.rep
       |                              ORDER BY q.quality DESC, q.doc_id) AS rn
       |    FROM dec JOIN q ON dec.doc_id = q.doc_id)
       |  WHERE rn = 1
       |)""".stripMargin
  }

  /** Shared recursive-reachability CTE prefix (exact oracle for the
    * iterative propagation; [[DataSplit]] builds its verdict oracles on the
    * same clusters).
    */
  private[graft] def reachCtes: String = reachCtesFor(DedupCorpus.augmentSql)

  /** [[reachCtes]] over an ARBITRARY corpus SQL (doc_id, text) — the seam
    * [[DataSplit.assignIncrementalOracleSql]] uses to replay the SAVED
    * snapshot's clusters (the base corpus) inside the same query that
    * clusters the new snapshot.
    */
  private[graft] def reachCtesFor(corpusSql: String): String = {
    val pairsSql = MinHashLSH.nearDupPairsOracleSqlCorpus(corpusSql)
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |corpus AS ($corpusSql),
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM pairs
       |  UNION ALL SELECT doc_b, doc_a FROM pairs
       |  UNION ALL SELECT doc_id, doc_id FROM corpus
       |),
       |reach(node, label) AS (
       |  SELECT doc_id, doc_id FROM corpus
       |  UNION
       |  SELECT e.src, r.label
       |  FROM reach r JOIN edges e ON e.dst = r.node
       |)""".stripMargin
  }

  /** Oracle SQL: recursive min-label reachability over the SAME pairs the
    * MinHash oracle computes, then min label per node.
    */
  def decisionsOracleSql: String =
    reachCtes +
      s"""
         |SELECT node AS doc_id, min(label) AS rep, node = min(label) AS keep
         |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin

  /** Oracle SQL for [[cleaned]]. */
  def cleanedOracleSql: String =
    reachCtes +
      s""",
         |dec AS (SELECT node AS doc_id, min(label) AS rep FROM reach GROUP BY node)
         |SELECT c.doc_id, md5(c.text) AS content_hash
         |FROM corpus c JOIN dec ON c.doc_id = dec.doc_id
         |WHERE c.doc_id = dec.rep
         |ORDER BY c.doc_id""".stripMargin
}
