package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Count-Min sketch (Cormode & Muthukrishnan, "An improved data stream
  * summary: the count-min sketch and its applications", J. Algorithms 2005)
  * as a RELATION: the d×w counter matrix is a (row, slot, c) frame built by
  * one partially-aggregated shuffle, merged across partitions by plain sum
  * (counter merge is associative — the property that makes CM the
  * distributed heavy-hitter sketch).
  *
  * Scale story (100 TB): the aggregation state per partition is bounded by
  * d·w = 2048 entries REGARDLESS of vocabulary — unlike an exact token
  * count whose hash-agg state grows with distinct tokens. The shuffle
  * carries ≤ d·w rows per map partition; estimates then need only the tiny
  * counter frame (broadcast) against whatever candidate set is queried.
  * Unlike Misra–Gries/SpaceSaving, whose merge is order-sensitive, CM
  * counters are sums — merge-order invariant, hence bit-identical across
  * any partitioning AND replayable by an external SQL engine: this is the
  * sketch family's first fully oracle-gated member (the HLL/quantile
  * approx queries are Spark-internal, rows-only).
  *
  * Hashes are the md5-prefix family ([[graft.dedup.Hashing.hash60]]) with
  * per-row salts, so Spark and DuckDB agree on every slot.
  *
  * Estimate: est(t) = min over rows i of counter[i, h_i(t)] — never an
  * underestimate; with w=512, E[overcount] ≤ N/512 per row and the min
  * over d=4 rows concentrates it (CountMinSpec pins the one-sided error
  * and the no-false-negative property at the 1 % report threshold).
  */
object CountMin {

  /** Sketch depth (independent hash rows). */
  val Depth = 4

  /** Sketch width (slots per row). */
  val Width = 512L

  /** Report threshold: tokens whose ESTIMATE is ≥ 1/[[HeavyFrac]] of the
    * stream length. Because est ≥ exact, every true heavy hitter is
    * reported (no false negatives — CM's one-sided guarantee).
    */
  val HeavyFrac = 100L

  /** Slot of `token` in row `i`. */
  private def slot(i: Int, token: Column): Column =
    Hashing.hash60(concat(lit(s"$i:"), token)) % Width

  /** The d (row, slot) coordinates of a token, as an explodable array. */
  private def coords(token: Column): Column =
    array((0 until Depth).map(i =>
      struct(lit(i).as("row"), slot(i, token).as("slot"))): _*)

  /** The corpus token stream (one row per token occurrence). */
  private def tokens(docs: DataFrame): DataFrame =
    docs
      .select(explode(Hashing.words(col("text"))).as("token"))
      .filter(col("token") =!= "")

  /** The (row, slot, c) counter matrix — d·w bounded aggregation state per
    * partition, one shuffle of ≤ d·w rows per map partition.
    */
  def counters(docs: DataFrame): DataFrame =
    countersFrom(tokens(docs))

  private def countersFrom(toks: DataFrame): DataFrame =
    toks
      .select(explode(coords(col("token"))).as("rs"))
      .groupBy(col("rs.row").as("row"), col("rs.slot").as("slot"))
      .agg(count(lit(1)).as("c"))

  /** Heavy hitters: (token, n_exact, n_est) for tokens whose CM estimate
    * clears the 1/[[HeavyFrac]] threshold, byte-ordered by token. The
    * exact-count column is the demo harness (at production scale only the
    * sketch survives); since est ≥ exact, the report provably contains
    * every true heavy hitter.
    */
  def heavyHitters(docs: DataFrame): DataFrame = {
    // the token stream feeds three consumers (counters, exact counts,
    // candidate coords) — materialize once, release via ContextCleaner
    val toks = tokens(docs).localCheckpoint(false)
    val cm = countersFrom(toks)
    val exact = toks.groupBy("token").agg(count(lit(1)).as("n_exact"))
    val total = exact.agg(sum("n_exact").as("__n"))
    exact
      .select(col("token"), col("n_exact"), explode(coords(col("token"))).as("rs"))
      .join(broadcast(cm),
        col("rs.row") === cm("row") && col("rs.slot") === cm("slot"))
      .groupBy(col("token"), col("n_exact"))
      .agg(min(col("c")).as("n_est"))
      .crossJoin(broadcast(total))
      .filter(col("n_est") * HeavyFrac >= col("__n"))
      .select(col("token"), col("n_exact"), col("n_est"))
  }

  // ---- DuckDB oracle (same hashes, same counters, same threshold) ----

  private def slotSql(i: Int): String =
    s"${Hashing.hash60Sql(s"'$i:' || token")} % $Width"

  def heavyHittersOracleSql(from: String = "documents"): String = {
    val rs = (0 until Depth)
      .map(i => s"SELECT $i AS row, ${slotSql(i)} AS slot FROM toks")
      .mkString("\n  UNION ALL\n  ")
    val cand = (0 until Depth)
      .map(i => s"SELECT token, n_exact, $i AS row, ${slotSql(i)} AS slot FROM exact")
      .mkString("\n  UNION ALL\n  ")
    s"""WITH toks AS (
       |  SELECT token FROM (
       |    SELECT unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS token
       |    FROM $from
       |  ) WHERE token <> ''
       |),
       |rs AS (
       |  $rs
       |),
       |cm AS (SELECT row, slot, CAST(count(*) AS BIGINT) AS c FROM rs GROUP BY 1, 2),
       |exact AS (SELECT token, CAST(count(*) AS BIGINT) AS n_exact FROM toks GROUP BY 1),
       |total AS (SELECT CAST(sum(n_exact) AS BIGINT) AS n FROM exact),
       |cand AS (
       |  $cand
       |),
       |est AS (
       |  SELECT token, n_exact, min(c) AS n_est
       |  FROM cand JOIN cm USING (row, slot) GROUP BY 1, 2
       |)
       |SELECT token, n_exact, n_est
       |FROM est, total WHERE n_est * $HeavyFrac >= total.n
       |ORDER BY token""".stripMargin
  }
}
