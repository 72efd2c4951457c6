package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing
import graft.operators.RangeRank

/** Weighted sampling WITHOUT replacement — "select the best k documents
  * with probability proportional to weight" — the fixed-size companion of
  * the Poisson-style weighted keep in [[ImportanceResample]] (which
  * controls only the EXPECTED sample size). A data-mixing pipeline reaches
  * for this when a downstream budget is a hard document count: exactly k
  * docs, longer/higher-quality docs favored, deterministic run-over-run.
  *
  * Algorithm: Efraimidis & Spirakis, "Weighted random sampling with a
  * reservoir" (Inf. Process. Lett. 97(5), 2006) — rank every item by
  * u_i^(1/w_i), u_i uniform, and take the top k; the selected set is
  * distributed exactly as sequential weighted draws without replacement.
  * The float-free spelling used here: for INTEGER weights,
  * u^(1/w) is equal in distribution to max(u_1..u_w), so each doc's rank
  * key is the MAX of w independent 60-bit md5 draws —
  *
  *   key_i = max_{j=1..w_i} hash60("aes:" || doc_id || "#" || j),
  *   P(key_i ≤ t) = (t/2^60)^{w_i}
  *
  * — all integer arithmetic, no pow/ln whose last-ulp behavior could
  * diverge between engines, so the DuckDB oracle replays the EXACT
  * selected set (the same reason [[UniverseSampled]] pays md5 instead of
  * `rand(seed)`). Draw independence comes from the per-(doc, j) salt; the
  * `aes:` prefix isolates this hash family from every other hash60 use of
  * doc_id.
  *
  * Scale design (100 TB): the per-row cost is w md5s (bounded by
  * [[MaxWeight]] — a weight range beyond ~16 should switch to two 60-bit
  * draws per md5 or a log-domain key, not more hashes). Selection is NOT
  * `ORDER BY key LIMIT k`: with k a corpus fraction, Spark's GlobalLimit
  * funnels all k survivors through ONE task. Instead the rank comes from
  * [[graft.operators.RangeRank.withPos]] (range-partitioned two-level
  * rank — one wide shuffle, every stage data-parallel) and k itself stays
  * IN-PLAN: a 1-row count aggregate cross-joined back (broadcast), so the
  * whole operator is a single declarative plan with no driver-side
  * count/limit. Sample size k = ⌈nothing⌉… exactly `greatest(1, n div
  * [[SampleDiv]])` of the live corpus count, derived the same way the IVF
  * nlist and LSH plane budgets are.
  *
  * Inclusion probabilities of A-ES have no closed form (Tillé's "exact
  * πps" problem), so unlike [[UniverseSampled]] there is no integer
  * Horvitz–Thompson scale-up here; [[summary]] is the descriptive
  * per-source report (selection rate vs weight share) a curation engineer
  * reads instead.
  */
object WeightedSampled {

  /** Weight cap — also the per-row md5 budget (see scale note above). */
  val MaxWeight = 8

  /** Characters per extra weight unit: w = clamp(1 + n_chars/[[WeightDiv]],
    * 1, [[MaxWeight]]) — "favor longer documents" as a stand-in for any
    * integer quality weight.
    */
  val WeightDiv = 100L

  /** Selected fraction: k = max(1, n div SampleDiv). */
  val SampleDiv = 10L

  private val Salt = "aes:"

  /** The integer weight of a document from its `n_chars` (NULL-safe,
    * clamped to [1, [[MaxWeight]]]).
    */
  def weight(nChars: Column): Column =
    least(lit(MaxWeight.toLong),
      greatest(lit(1L),
        lit(1L) + call_function("div", coalesce(nChars, lit(0L)), lit(WeightDiv))))

  private def weightSql(nCharsExpr: String): String =
    s"least($MaxWeight, greatest(1, 1 + coalesce($nCharsExpr, 0) // $WeightDiv))"

  /** The A-ES rank key: max of `w` salted 60-bit draws. Unrolled to a
    * static `greatest` over [[MaxWeight]] guarded branches (each `when`
    * only pays its md5 on rows with w ≥ j), keeping the whole key inside
    * whole-stage codegen — a `transform(sequence(1, w), …)` HOF spelling
    * would be CodegenFallback (the [[graft.dedup.Hashing.shingles]]
    * lesson). Sentinel −1 sits below the hash range [0, 2^60), and w ≥ 1
    * guarantees at least one live draw.
    */
  def drawKey(unit: Column, w: Column): Column =
    greatest((1 to MaxWeight).map { j =>
      when(w >= j, Hashing.hash60(concat(lit(Salt), unit, lit(s"#$j"))))
        .otherwise(lit(-1L))
    }: _*)

  private def drawKeySql(unitExpr: String, wExpr: String): String =
    (1 to MaxWeight).map { j =>
      s"CASE WHEN $wExpr >= $j THEN ${Hashing.hash60Sql(s"'$Salt' || $unitExpr || '#$j'")} ELSE -1 END"
    }.mkString("greatest(", ", ", ")")

  /** (doc_id, source, w, akey) for every document. */
  private[graft] def keyed(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"), col("source"),
      weight(col("n_chars")).as("w"))
      .withColumn("akey", drawKey(col("doc_id").cast("string"), col("w")))

  /** The ranked frame with the in-plan k: every doc, its global rank in
    * (akey DESC, doc_id ASC) order, and the live-count-derived cutoff.
    */
  // private[graft]: GlobalWindowTripwireSpec walks this UN-checkpointed
  // fragment directly — summary() checkpoints it, which hides its windows
  // from the declared-query plan walk (the tripwire's documented blind
  // spot), so the spec pins the fragment's global-window count here
  private[graft] def rankedWithK(docs: DataFrame): DataFrame = {
    val kFrame = docs.select(
      greatest(lit(1L),
        call_function("div", count(lit(1)).cast("long"), lit(SampleDiv))).as("__k"))
    RangeRank.withPos(
      keyed(docs).withColumn("__nkey", -col("akey")),
      Seq("__nkey", "doc_id"))
      .drop("__nkey")
      .crossJoin(broadcast(kFrame))
  }

  /** The weighted sample: the k = max(1, n/[[SampleDiv]]) documents with
    * the largest A-ES keys — exactly a weighted draw of k docs without
    * replacement.
    */
  def sample(docs: DataFrame): DataFrame =
    rankedWithK(docs)
      .filter(col("pos") <= col("__k"))
      .select(col("doc_id"), col("w"), col("akey"))

  /** Fixed-k variant — the contract a STREAMING reservoir can honor (k
    * must be known up front; the fraction-of-n cutoff needs the live
    * count a stream never has). Same keys, same rank machinery, literal
    * cutoff; [[graft.streaming.StreamingWeightedReservoir]] maintains
    * this selection incrementally and its replay query gates against
    * [[sampleKOracleSql]].
    */
  def sampleK(docs: DataFrame, k: Int): DataFrame =
    RangeRank.withPos(
      keyed(docs).withColumn("__nkey", -col("akey")),
      Seq("__nkey", "doc_id"))
      .filter(col("pos") <= k)
      .select(col("doc_id"), col("w"), col("akey"))

  /** Per-source quota selection — stratified A-ES: within EVERY source,
    * the k_s = max(1, n_s div [[SampleDiv]]) documents with the largest
    * keys, k_s derived in-plan from the live per-source counts (the
    * congressional-sampling rate discipline applied to fixed-size
    * selection: no collect, no caller-pinned quotas). Because the draw
    * keys are independent across all docs, each source's cut is exactly
    * an independent weighted draw of k_s without replacement.
    *
    * Scale shape: the naive `row_number() OVER (PARTITION BY source
    * ORDER BY key)` makes every hot source a corpus-sized single-task
    * sort; instead the [[graft.text.QualityDeciles]] pattern — ONE
    * global [[RangeRank]] over (source, key desc, id), then per-source
    * ranks by subtracting the source's global offset, a |sources|-row
    * broadcast (its prefix window runs over source COUNTS, never data).
    */
  def sampleBySource(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // two consumers (source meta, the quota filter) — materialize the
    // ranked frame once, same as QualityDeciles
    val ranked = RangeRank.withPos(
      keyed(docs).withColumn("__nkey", -col("akey")),
      Seq("source", "__nkey", "doc_id"))
      .localCheckpoint(false)
    val srcMeta = ranked.groupBy("source").agg(count(lit(1)).as("n"))
      .withColumn("off",
        coalesce(
          sum(col("n")).over(
            Window.orderBy("source").rowsBetween(Window.unboundedPreceding, -1)),
          lit(0L)))
      .withColumn("k_s",
        greatest(lit(1L), call_function("div", col("n"), lit(SampleDiv))))
      .select("source", "off", "k_s")
    ranked.join(broadcast(srcMeta), Seq("source"))
      .filter(col("pos") - col("off") <= col("k_s"))
      .select(col("source"), col("doc_id"), col("w"), col("akey"))
  }

  /** Per-source selection report: corpus docs and weight mass vs selected
    * docs and weight mass, plus the per-mille selection rate — the "did
    * the weighting bias the mix the way I intended" readout. All counts
    * integer; both aggregate sides are |sources|-row frames joined
    * broadcast.
    */
  def summary(docs: DataFrame): DataFrame = {
    // ONE ranked frame for both sides, checkpointed HERE: the RangeRank
    // core inside rankedWithK is already materialized, but the in-plan k
    // (a full count scan of docs) and the offset join are not — without
    // this outer checkpoint each consumer re-ran that corpus count scan,
    // exactly the duplicated pass the 100 TB argument is about (ADVICE
    // r15). sample()/sampleBySource are single-consumer and skip it.
    val ranked = rankedWithK(docs).localCheckpoint(false)
    val bySel = ranked.filter(col("pos") <= col("__k")).groupBy("source").agg(
      count(lit(1)).as("n_sel"),
      sum(col("w")).as("w_sel"))
    val byAll = ranked.groupBy("source").agg(
      count(lit(1)).as("n_src"),
      sum(col("w")).as("w_src"))
    byAll.join(broadcast(bySel), Seq("source"), "left")
      .select(
        col("source"), col("n_src"), col("w_src"),
        coalesce(col("n_sel"), lit(0L)).as("n_sel"),
        coalesce(col("w_sel"), lit(0L)).as("w_sel"))
      .withColumn("sel_permille", expr("(1000 * n_sel) div n_src"))
  }

  // ---- DuckDB oracle generation (same constants, same computation) ----

  /** The ONE spelling of the cross-engine key derivation CTEs
    * `wk(doc_id, source, w)` / `kk(doc_id, source, w, akey)` — every
    * weighted-sample oracle composes THIS (review r15: three re-spelled
    * copies of the load-bearing key SQL had accumulated; an edit applied
    * to one would silently diverge the gates).
    */
  private def keyedCteSql(from: String): String =
    s"""wk AS (
       |  SELECT doc_id, source, ${weightSql("n_chars")} AS w
       |  FROM $from),
       |kk AS (
       |  SELECT doc_id, source, w,
       |         ${drawKeySql("CAST(doc_id AS VARCHAR)", "w")} AS akey
       |  FROM wk)""".stripMargin

  private def rankedCteSql(from: String): String = {
    s"""${keyedCteSql(from)},
       |r AS (
       |  SELECT doc_id, source, w, akey,
       |         CAST(row_number() OVER (ORDER BY akey DESC, doc_id) AS BIGINT) AS pos
       |  FROM kk),
       |sel AS (
       |  SELECT * FROM r
       |  WHERE pos <= (SELECT greatest(1, count(*) // $SampleDiv) FROM $from))""".stripMargin
  }

  def sampleOracleSql(from: String = "documents"): String =
    s"""WITH ${rankedCteSql(from)}
       |SELECT doc_id, w, akey FROM sel ORDER BY doc_id""".stripMargin

  /** Oracle for [[sampleBySource]]: per-source rank + live-count quota,
    * the same integer derivation.
    */
  def sampleBySourceOracleSql(from: String = "documents"): String = {
    s"""WITH ${keyedCteSql(from)},
       |r AS (
       |  SELECT source, doc_id, w, akey,
       |         CAST(row_number() OVER (PARTITION BY source
       |                                 ORDER BY akey DESC, doc_id) AS BIGINT) AS rn,
       |         CAST(count(*) OVER (PARTITION BY source) AS BIGINT) AS n
       |  FROM kk)
       |SELECT source, doc_id, w, akey FROM r
       |WHERE rn <= greatest(1, n // $SampleDiv)
       |ORDER BY doc_id""".stripMargin
  }

  /** Oracle for [[sampleK]] (and the streaming reservoir replay): the
    * same key CTEs with a literal rank cutoff.
    */
  def sampleKOracleSql(k: Int, from: String = "documents"): String = {
    s"""WITH ${keyedCteSql(from)}
       |SELECT doc_id, w, akey FROM kk
       |QUALIFY row_number() OVER (ORDER BY akey DESC, doc_id) <= $k
       |ORDER BY doc_id""".stripMargin
  }

  def summaryOracleSql(from: String = "documents"): String =
    s"""WITH ${rankedCteSql(from)},
       |a AS (SELECT source, count(*) AS n_src,
       |             CAST(sum(w) AS BIGINT) AS w_src
       |      FROM wk GROUP BY source),
       |s AS (SELECT source, count(*) AS n_sel,
       |             CAST(sum(w) AS BIGINT) AS w_sel
       |      FROM sel GROUP BY source)
       |SELECT a.source, a.n_src, a.w_src,
       |       coalesce(s.n_sel, 0) AS n_sel,
       |       coalesce(s.w_sel, 0) AS w_sel,
       |       (1000 * coalesce(s.n_sel, 0)) // a.n_src AS sel_permille
       |FROM a LEFT JOIN s USING (source) ORDER BY a.source""".stripMargin
}
