package graft.graphs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bounded-round k-core peeling over the P10 link graph — the classic
  * dense-subgraph / influence-filter decomposition (Seidman 1983;
  * Matula–Beck peel): repeatedly drop every node whose degree in the
  * CURRENT subgraph is below k, keep what survives.
  *
  * k is derived IN-PLAN from the live graph — `k = m div n + 1`, one past
  * half the mean degree (pure integer division over two broadcast
  * one-row aggregates, the congressional-rate discipline), so the peel
  * stays non-trivial as the fixture scales instead of pinning a constant
  * that empties one scale and no-ops another; the DuckDB oracle replays
  * the same derivation.
  *
  * The peel runs a FIXED [[Rounds]] = 5 rounds (the
  * [[PageRank.Iterations]] contract): the oracle unrolls exactly five
  * round-CTE pairs, so engine and oracle meet bit-for-bit even on a graph
  * where five rounds have not converged — and [[summary]] reports a
  * `converged` flag (round-4 and round-5 edge frames are nested subsets,
  * so equal COUNTS ⟺ equal sets, an exact integer test). Fixture graphs
  * converge in 1–2 rounds (spec-pinned against an until-fixpoint brute
  * force); adversarial chain graphs need O(n) rounds — raise Rounds, the
  * cost is one degree aggregate + two semi-joins per round.
  *
  * Scale design (100 TB): per round, one partial-agg'd degree aggregate
  * (exchange carries distinct nodes) and two node-keyed LEFT-SEMI joins
  * of the shrinking edge frame; the edge frame is localCheckpoint'd per
  * round (the CC lineage-truncation discipline) and only (a, b) longs
  * ever shuffle. No collect — k rides as a broadcast one-row frame.
  */
object KCore {

  val Rounds = 5

  private def degrees(e: DataFrame): DataFrame =
    e.select(explode(array(col("a"), col("b"))).as("v"))
      .groupBy("v").agg(count(lit(1)).as("deg"))

  /** (final-round edge frame, previous-round edge frame, k one-row frame). */
  private def peel(events: DataFrame): (DataFrame, DataFrame, DataFrame) = {
    val e0 = Triangles.canonicalEdges(events).localCheckpoint(false)
    val kFrame = e0.agg(count(lit(1)).as("m"))
      .crossJoin(degrees(e0).agg(count(lit(1)).as("n")))
      .select(expr("m DIV n + 1").as("k"))
      .localCheckpoint(false)
    var prev = e0
    var e = e0
    (1 to Rounds).foreach { _ =>
      prev = e
      val keep = degrees(e)
        .crossJoin(broadcast(kFrame))
        .filter(col("deg") >= col("k"))
        .select("v")
      e = e
        .join(keep.withColumnRenamed("v", "a"), Seq("a"), "left_semi")
        .join(keep.withColumnRenamed("v", "b"), Seq("b"), "left_semi")
        .select("a", "b")
        .localCheckpoint(false)
    }
    (e, prev, kFrame)
  }

  /** (node, deg): the surviving nodes with their in-core degrees. */
  def core(events: DataFrame): DataFrame = {
    val (e, _, _) = peel(events)
    degrees(e).select(col("v").as("node"), col("deg"))
  }

  /** One-row (k, n_core, m_core, converged): converged = the round-4 and
    * round-5 edge frames have equal size (nested subsets ⇒ equal sets).
    */
  def summary(events: DataFrame): DataFrame = {
    val (e, prev, kFrame) = peel(events)
    kFrame
      .crossJoin(broadcast(degrees(e).agg(count(lit(1)).as("n_core"))))
      .crossJoin(broadcast(e.agg(count(lit(1)).as("m_core"))))
      .crossJoin(broadcast(prev.agg(count(lit(1)).as("__m_prev"))))
      .select(
        col("k"), col("n_core"), col("m_core"),
        (col("m_core") === col("__m_prev")).cast("int").as("converged"))
  }

  /** The unrolled 5-round CTE chain shared by both oracle spellings.
    * MATERIALIZED hints are required: each round references its
    * predecessor three times and DuckDB 1.x would otherwise re-inline the
    * whole chain exponentially (the docs_training_shard_substring
    * precedent).
    */
  private def peelCtes: String = {
    val rounds = (1 to Rounds).map { t =>
      val prev = if (t == 1) "e0" else s"e${t - 1}"
      s"""d$t AS MATERIALIZED (
         |  SELECT v, count(*) AS deg
         |  FROM (SELECT a AS v FROM $prev UNION ALL SELECT b FROM $prev) GROUP BY v
         |), k$t AS MATERIALIZED (
         |  SELECT v FROM d$t WHERE deg >= (SELECT k FROM kk)
         |), e$t AS MATERIALIZED (
         |  SELECT a, b FROM $prev
         |  WHERE a IN (SELECT v FROM k$t) AND b IN (SELECT v FROM k$t)
         |)""".stripMargin
    }.mkString(",\n")
    s"""WITH ${PageRank.edgesCteSql},
       |e0 AS MATERIALIZED (SELECT src AS a, dst AS b FROM edges WHERE src < dst),
       |kk AS MATERIALIZED (
       |  SELECT count(*) // (SELECT count(DISTINCT v)
       |                      FROM (SELECT a AS v FROM e0 UNION ALL SELECT b FROM e0))
       |         + 1 AS k
       |  FROM e0
       |),
       |$rounds""".stripMargin
  }

  def coreOracleSql: String =
    s"""$peelCtes
       |SELECT v AS node, CAST(count(*) AS BIGINT) AS deg
       |FROM (SELECT a AS v FROM e$Rounds UNION ALL SELECT b FROM e$Rounds)
       |GROUP BY v
       |ORDER BY node""".stripMargin

  def summaryOracleSql: String =
    s"""$peelCtes
       |SELECT CAST((SELECT k FROM kk) AS BIGINT) AS k,
       |       (SELECT CAST(count(DISTINCT v) AS BIGINT)
       |        FROM (SELECT a AS v FROM e$Rounds UNION ALL SELECT b FROM e$Rounds))
       |         AS n_core,
       |       (SELECT CAST(count(*) AS BIGINT) FROM e$Rounds) AS m_core,
       |       CAST(CASE WHEN (SELECT count(*) FROM e$Rounds)
       |                    = (SELECT count(*) FROM e${Rounds - 1})
       |            THEN 1 ELSE 0 END AS INT) AS converged""".stripMargin
}
