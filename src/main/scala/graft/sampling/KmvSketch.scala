package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** KMV (k-minimum-values) distinct-count sketch (Bar-Yossef et al.,
  * RANDOM 2002; Beyer et al., "On synopses for distinct value
  * estimation", SIGMOD 2007): hash every element uniformly, keep the k
  * SMALLEST hash values, and estimate the distinct count from the k-th
  * order statistic — `D̂ = (k−1) · M ∕ h₍ₖ₎` for hashes on [0, M).
  * Relative error concentrates at ~1/√k.
  *
  * WHY THIS SKETCH, when the engine already exposes HLL++
  * (`events_distinct_users_approx`): the md5 hash order is
  * deterministic, the bottom-k set is a pure function of the data, and
  * the estimate is one integer division — so unlike HLL's opaque binary
  * registers, the ENTIRE sketch replays in an external SQL engine and
  * the approximate answer itself passes the DuckDB hash gate. This is
  * the family's second fully oracle-gated sketch (Count-Min was the
  * first); HLL remains the rows-only production alternative when 1.5 kB
  * of state per group matters more than replayability.
  *
  * Scale shape: one distinct-collapse aggregate on (group, hash) —
  * partial map-side, so a hot group's repeated elements collapse inside
  * each mapper — then a bottom-k window that Catalyst executes with a
  * pre-shuffle WindowGroupLimit (≤ k rows per partition per group reach
  * the exchange), then a k-row-per-group aggregate. State per group
  * after the collapse is bounded by k everywhere downstream. Union-merge
  * of two corpora is bottom-k of the union — the mergeability that makes
  * KMV a distributed sketch.
  *
  * Hashes are [[Hashing.hash60]] down-shifted to 54 bits so the
  * `(k−1)·M` numerator stays inside a long for any k ≤ 512.
  */
object KmvSketch {

  /** 54-bit hash modulus (see numerator-overflow note above). */
  val Mod54 = 1L << 54

  /** Hash salt — independent of every other hash60 use. */
  val Salt = "kmv:"

  /** Per-group bottom-k default: k=32 → ~18 % rel-stddev, small enough
    * that the sf0.01 fixture (150 users/group) genuinely ESTIMATES
    * rather than degenerating to the exact-count branch.
    */
  val GroupK = 32

  /** Global vocab default: k=256 → ~6 % rel-stddev. */
  val VocabK = 256

  /** (group, est) — KMV distinct-count estimate of `elem` per `group`.
    * Groups with fewer than k distinct hashes report the EXACT count
    * (the sketch saw everything); otherwise the order-statistic estimate.
    */
  def distinctEstimate(df: DataFrame, group: Column, elem: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 512, "k must be in [2, 512] (numerator overflow bound)")
    val hashed = df
      // integer `div`, NOT `/`: long / long routes through double, which
      // cannot represent 60-bit hashes exactly (> 2^53) and would round
      // differently than DuckDB's integer `// 64`
      .select(group.as("grp"),
        Hashing.hash60(concat(lit(Salt), elem.cast("string"))).as("h60"))
      .select(col("grp"), expr("h60 div 64").as("h"))
      .distinct()
    val w = Window.partitionBy("grp").orderBy("h")
    hashed
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n"), max(col("h")).as("hk"))
      .select(
        col("grp"),
        when(col("n") < k, col("n"))
          .otherwise(expr(s"(${k - 1} * ${Mod54}L) div greatest(hk, 1L)"))
          .as("est_distinct"))
      .orderBy("grp")
  }

  /** ONE-PASS [[distinctEstimate]] via the native `bottom_k`
    * [[graft.functions.BottomKDistinct]] aggregate: no pre-distinct
    * shuffle, no window — each map task's partial aggregation holds a
    * ≤ k-element ordered set per group and the exchange carries
    * groups × k longs regardless of element cardinality (vs the window
    * spelling's distinct-collapse of the full (group, hash) domain).
    * Same estimator, same oracle: bottom-k is order-insensitive, so both
    * spellings produce identical rows.
    */
  def distinctEstimateAgg(df: DataFrame, group: Column, elem: Column, k: Int): DataFrame =
    estimateFromSketch(sketch(df, group, elem, k), k).orderBy("grp")

  /** The per-group bottom-k sketch frame `(grp, arr)` — the ONE Spark
    * spelling of the sketch (salted hash, 54-bit downshift, `bottom_k`),
    * shared by the one-pass estimator, the pairwise set algebra, and the
    * saved-artifact incremental path (the Spark twin of [[sketchCteSql]]).
    * `arr` is ascending and ≤ k long — the mergeable synopsis: bottom-k
    * of two sketches' union IS the sketch of the unioned inputs.
    */
  def sketch(df: DataFrame, group: Column, elem: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 512, "k must be in [2, 512] (numerator overflow bound)")
    df
      .select(group.as("grp"),
        Hashing.hash60(concat(lit(Salt), elem.cast("string"))).as("h60"))
      .select(col("grp"), expr("h60 div 64").as("h"))
      .groupBy(col("grp"))
      .agg(graft.functions.BottomKDistinct.bottomK(col("h"), k).as("arr"))
  }

  /** Order-statistic estimate from a sketch frame (exact below k). */
  def estimateFromSketch(sk: DataFrame, k: Int): DataFrame =
    sk.select(
      col("grp"),
      when(size(col("arr")) < k, size(col("arr")).cast("long"))
        .otherwise(
          expr(s"(${k - 1} * ${Mod54}L) div greatest(element_at(arr, $k), 1L)"))
        .as("est_distinct"))

  /** KMV SET ALGEBRA (Beyer et al. SIGMOD 2007 §5): estimate every
    * source pair's vocabulary overlap — union size, intersection size,
    * Jaccard — from the per-group bottom-k sketches ALONE. The combined
    * sketch L = bottom-k(L_A ∪ L_B) is a valid KMV sketch of A ∪ B
    * (any element of a saturated source missing from its sketch exceeds
    * that sketch's max, which is ≥ the union's k-th minimum, so the true
    * bottom-k of A ∪ B is always inside L_A ∪ L_B; an unsaturated
    * sketch is the complete set), and the match fraction
    * ρ = |L ∩ L_A ∩ L_B| / |L| is an unbiased Jaccard estimator, so
    *
    *   Ĵ = ρ,   D̂_∪ = (k−1)·M ∕ h₍ₖ₎,   D̂_∩ = ρ · D̂_∪
    *
    * — all integer, all replayed by the oracle. When |L| < k both
    * sketches were complete sets and every figure is EXACT.
    *
    * Scale shape — the whole point at 100 TB: the corpus is touched once
    * by the `bottom_k` partial aggregate (exchange carries |groups|·k
    * longs); the pairwise algebra runs on the |groups|-row sketch frame
    * (broadcast self-join + per-pair array math over ≤ 2k elements), so
    * cross-source overlap costs no token-level join at all — the exact
    * alternative shuffles the full (source, token) domain against itself.
    * The |pairs| = |groups|² output is the intended regime: source-level
    * group counts (tens to thousands), not per-user cardinalities.
    */
  def pairwiseOverlap(df: DataFrame, group: Column, elem: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 512, "k must be in [2, 512] (numerator overflow bound)")
    // the |groups|-row sketch frame feeds BOTH join sides: materialize it
    // so the corpus-wide scan + bottom_k aggregate runs once by
    // construction, not by hoping Catalyst exchange reuse fires (review
    // r15 — the two-consumer discipline every other shared frame follows;
    // the checkpoint is |groups| rows, metadata-priced)
    val sk = sketch(df, group, elem, k).localCheckpoint(false)
    val pairs = sk.select(col("grp").as("src_a"), col("arr").as("xa"))
      .join(broadcast(sk.select(col("grp").as("src_b"), col("arr").as("ya"))),
        col("src_a") < col("src_b"))
    pairs
      .select(
        col("src_a"), col("src_b"),
        slice(array_sort(array_union(col("xa"), col("ya"))), 1, k).as("u"),
        array_intersect(col("xa"), col("ya")).as("bo"))
      .select(
        col("src_a"), col("src_b"),
        size(col("u")).cast("long").as("un"),
        element_at(col("u"), size(col("u"))).as("kth"),
        col("bo"))
      // members of L are exactly the union elements ≤ its k-th minimum
      // (u is deduped and sorted), so the match count is a bounded-array
      // filter — ≤ k elements per PAIR row, not per corpus row, so the
      // interpreted HOF is metadata-cost here
      .withColumn("m",
        size(filter(col("bo"), e => e <= col("kth"))).cast("long"))
      .withColumn("est_union",
        when(col("un") < k, col("un"))
          .otherwise(expr(s"(${k - 1} * ${Mod54}L) div greatest(kth, 1L)")))
      .select(
        col("src_a"), col("src_b"), col("est_union"),
        // quotient–remainder split of (m·est_union) div un (ADVICE r15):
        // the direct product can reach m·(k−1)·2^54/kth; with kth at its
        // floor k−1 and m = un = k = 512 that is exactly 2^63 — one past
        // Long.MaxValue. Splitting keeps every term ≤ 2^54 + un² while
        // computing the identical integer value:
        //   m·(q·un + r) div un = m·q + (m·r) div un,  q = eu div un
        expr("m * (est_union div un) + (m * (est_union % un)) div un")
          .as("est_intersect"),
        expr("(1000 * m) div un").as("jaccard_permille"))
  }

  /** DuckDB replay of [[pairwiseOverlap]] over a (group, elem) projection
    * — same sketches, same combined-sketch algebra, same integer
    * estimators.
    */
  def pairwiseOverlapOracleSql(
      fromSql: String, groupCol: String, elemExpr: String, k: Int): String = {
    s"""WITH ${sketchCteSql(fromSql, groupCol, elemExpr, k)},
       |sk AS (SELECT grp, list(h ORDER BY h) AS arr FROM b GROUP BY grp),
       |p AS (
       |  SELECT x.grp AS src_a, y.grp AS src_b,
       |         list_sort(list_distinct(x.arr || y.arr))[1:$k] AS u,
       |         list_intersect(x.arr, y.arr) AS bo
       |  FROM sk x JOIN sk y ON x.grp < y.grp
       |),
       |d AS (
       |  SELECT src_a, src_b,
       |         CAST(len(u) AS BIGINT) AS un, u[len(u)] AS kth,
       |         CAST(len(list_filter(bo, e -> e <= u[len(u)])) AS BIGINT) AS m
       |  FROM p
       |),
       |e AS (
       |  SELECT src_a, src_b, un, m,
       |         CASE WHEN un < $k THEN un
       |              ELSE (${k - 1} * $Mod54) // greatest(kth, 1) END AS est_union
       |  FROM d
       |)
       |SELECT src_a, src_b, est_union,
       |       m * (est_union // un) + (m * (est_union % un)) // un AS est_intersect,
       |       (1000 * m) // un AS jaccard_permille
       |FROM e ORDER BY src_a, src_b""".stripMargin
  }

  /** Oracle SQL for [[distinctEstimate]] over a (group, elem) projection:
    * same salted hash, same bottom-k, same integer estimator.
    */
  /** Snapshot split for the incremental vocab path: docs with
    * doc_id % DeltaMod == 0 "arrive later" (the
    * [[graft.dedup.IncrementalDedup.DeltaMod]] rule over the RAW
    * documents — source is carried, unlike the dedup corpus's
    * augmented split).
    */
  private def isDelta: Column =
    col("doc_id") % graft.dedup.IncrementalDedup.DeltaMod === 0

  private def sourceTokens(docs: DataFrame): DataFrame =
    docs.select(col("source"),
      explode(Hashing.words(col("text"))).as("w"))
      .filter(col("w") =!= "")

  /** Build-once per-source vocab sketch of the BASE snapshot — keyed on
    * the table's content digest plus every sketch parameter, the
    * [[graft.dedup.SavedArtifact]] discipline.
    */
  private[graft] def ensureSavedVocabSketch(
      spark: org.apache.spark.sql.SparkSession, dir: String, k: Int): String =
    graft.dedup.SavedArtifact.ensure(
      "graft_kmvvocab",
      graft.queries.Tables.contentDigest(
        graft.queries.Tables.path(dir, "documents")),
      Seq(Salt, k, 64, Mod54, graft.dedup.IncrementalDedup.DeltaMod)) { tmp =>
      sketch(
        sourceTokens(graft.queries.Tables.documents(spark, dir).filter(!isDelta)),
        col("source"), col("w"), k)
        .write.mode("overwrite").parquet(tmp)
    }

  /** INCREMENTAL per-source vocab estimates: merge the saved base-snapshot
    * sketches with a sketch of the DELTA alone — the old corpus is never
    * rescanned; the only data-scale work is one pass over the new docs.
    * Because bottom-k of two sketches' union is exactly the sketch of the
    * unioned corpora (the mergeability [[pairwiseOverlap]] relies on and
    * KmvSketchSpec pins at the bit level), the merged estimate equals the
    * full-recompute estimate — which is what the oracle replays, making
    * the incremental path itself hash-gated. The merge is a |sources|-row
    * full-outer join + bounded array math: metadata-priced at any corpus
    * size. This is the sketch sibling of
    * [[graft.dedup.IncrementalDedup]]'s saved signature index and
    * [[graft.dedup.DataSplit]]'s saved assignment.
    */
  def vocabIncremental(
      spark: org.apache.spark.sql.SparkSession, dir: String, k: Int = VocabK): DataFrame = {
    val saved = spark.read.parquet(ensureSavedVocabSketch(spark, dir, k))
      .select(col("grp"), col("arr").as("arr_base"))
    val delta = sketch(
      sourceTokens(graft.queries.Tables.documents(spark, dir).filter(isDelta)),
      col("source"), col("w"), k)
      .select(col("grp"), col("arr").as("arr_delta"))
    val empty = array().cast("array<bigint>")
    val merged = saved.join(delta, Seq("grp"), "full")
      .select(
        col("grp"),
        slice(
          array_sort(array_union(
            coalesce(col("arr_base"), empty),
            coalesce(col("arr_delta"), empty))),
          1, k).as("arr"))
    estimateFromSketch(merged, k)
      .select(col("grp").as("source"), col("est_distinct"))
      .orderBy("source")
  }

  /** The ONE spelling of the sketch CTEs `hashed` / `b` (salted hash,
    * 54-bit downshift, bottom-k) — both oracle generators compose THIS,
    * so a sketch-spelling edit can never diverge `text_vocab_kmv` from
    * `text_source_jaccard_kmv` (review r15).
    */
  private def sketchCteSql(
      fromSql: String, groupCol: String, elemExpr: String, k: Int): String = {
    val hash = Hashing.hash60Sql(s"'$Salt' || $elemExpr")
    s"""hashed AS (
       |  SELECT DISTINCT $groupCol AS grp, ($hash) // 64 AS h
       |  FROM ($fromSql)
       |),
       |b AS (
       |  SELECT grp, h FROM hashed
       |  QUALIFY row_number() OVER (PARTITION BY grp ORDER BY h) <= $k
       |)""".stripMargin
  }

  def distinctEstimateOracleSql(
      fromSql: String, groupCol: String, elemExpr: String, k: Int,
      groupAlias: String = "grp"): String = {
    s"""WITH ${sketchCteSql(fromSql, groupCol, elemExpr, k)},
       |a AS (SELECT grp, count(*) AS n, max(h) AS hk FROM b GROUP BY 1)
       |SELECT grp AS $groupAlias,
       |       CASE WHEN n < $k THEN n
       |            ELSE (${k - 1} * $Mod54) // greatest(hk, 1) END AS est_distinct
       |FROM a ORDER BY 1""".stripMargin
  }
}
