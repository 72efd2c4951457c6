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
  * large-star/small-star CC algorithm, same join shape with
  * alternation — the per-round plan here is exactly that building block.
  */
object DedupClusters {

  val MaxIterations = 20

  /** (node, rep) for every doc in `corpus`, where rep is the smallest
    * doc_id in the node's connected component of the `pairs` graph
    * (doc_a, doc_b columns). Singletons map to themselves.
    */
  def components(corpus: DataFrame, pairs: DataFrame): DataFrame = {
    val nodes = corpus.select(col("doc_id").as("node"))
    // closed-neighborhood edges: both directions + self-loop. The edge
    // table is tiny relative to the corpus — pre-shuffle it once to a
    // handful of partitions so the per-iteration joins don't pay
    // session-wide shuffle-partition scheduling overhead.
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionAll(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .unionAll(nodes.select(col("node").as("src"), col("node").as("dst")))
      .repartition(8, col("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    var labels = nodes.select(col("node"), col("node").as("label"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // Convergence via Σlabel: min-propagation only ever DECREASES labels,
    // so an unchanged sum ⟺ a fixed point — one action per iteration
    // (materializing the persist as a side effect) instead of a
    // change-detection join + count.
    var prevSum = labels.agg(sum(col("label"))).head().getLong(0)
    var converged = false
    var iter = 0
    while (!converged && iter < MaxIterations) {
      val next = edges
        .join(labels.withColumnRenamed("node", "dst"), Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(min(col("label")).as("label"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val newSum = next.agg(sum(col("label"))).head().getLong(0)
      labels.unpersist()
      labels = next
      converged = newSum == prevSum
      prevSum = newSum
      iter += 1
    }
    edges.unpersist()
    labels.select(col("node").as("doc_id"), col("label").as("rep"))
  }

  /** Dedup verdict per doc: its cluster representative and whether it
    * survives (is the representative).
    */
  def decisions(corpus: DataFrame, pairs: DataFrame): DataFrame =
    components(corpus, pairs)
      .select(col("doc_id"), col("rep"), (col("doc_id") === col("rep")).as("keep"))

  /** Oracle SQL: recursive min-label reachability over the SAME pairs the
    * MinHash oracle computes, then min label per node.
    */
  def decisionsOracleSql: String = {
    val pairsSql = MinHashLSH.nearDupPairsOracleSql()
    s"""WITH RECURSIVE pairs AS ($pairsSql),
       |corpus AS (${DedupCorpus.augmentSql}),
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
       |)
       |SELECT node AS doc_id, min(label) AS rep, node = min(label) AS keep
       |FROM reach GROUP BY node ORDER BY doc_id""".stripMargin
  }
}
