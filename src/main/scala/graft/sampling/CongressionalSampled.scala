package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Congressional sampling — per-stratum rates derived IN-PLAN from the live
  * stratum counts so every group-by group keeps ~`targetK` rows (Acharya,
  * Gibbons, Poosala, "Congressional Samples for Approximate Answering of
  * Group-By Queries", SIGMOD 2000: the "house" allocation).
  *
  * The gap this closes in the AQP family: a flat-rate sampler
  * ([[UniverseSampled]], [[StratifiedSampled]] with caller-given rates)
  * starves small groups — at p = 0.1 a 50-row stratum expects 5 survivors
  * (√((1−p)/(p·n)) ≈ 42 % relative error) and may vanish outright (the
  * documented absent-month caveat on [[JoinSampled.revenueMonthlySampledU]]).
  * Congressional allocation inverts the rate per stratum: `bp_g =
  * ceil(targetK·Mod / n_g)` capped at [[Mod]], so EXPECTED survivors are
  * ~targetK everywhere, strata with `n_g ≤ targetK` ride COMPLETE (their
  * estimates are exact, not approximate), and the per-group relative error
  * is ~1/√targetK uniformly — independent of how skewed the stratum sizes
  * are. [[StratifiedSampled]] is the mechanism (per-stratum hash-range
  * thresholds); this derives the thresholds from the data, the
  * [[graft.similarity.PlaneBudget]] / `nlistFor` / `maxDfFor` discipline
  * applied to sampling rates.
  *
  * Scale shape: the rate table is ONE partial-aggregated count over the
  * column-pruned stratum projection (|strata| rows — bounded by the
  * stratification SCHEME, not by corpus size), broadcast back against
  * the fact scan; the keep-filter evaluates map-side right behind the
  * broadcast join, so the fact table crosses ZERO exchanges before it is
  * thinned to ~|strata|·targetK rows. The rates stay a DataFrame end to
  * end (no `.collect()` loop); the broadcast itself materializes the
  * |strata|-row relation driver-side like any broadcast join — fine
  * through ~10⁶ short-keyed strata, see [[sample]] for the beyond-limit
  * trade.
  *
  * Determinism/exactness contract (the oracle discipline): thresholds are
  * INTEGER basis points out of [[Mod]] via exact long ceil-division; the
  * keep predicate is the salted [[Hashing.hash60]] of the unit id; HT
  * weighting happens ONCE per group row at the END — `sum_kept · Mod / bp`,
  * two exact integers into one double division — never as a per-row double
  * weight whose summation order an external engine couldn't replay.
  */
object CongressionalSampled {

  /** Basis-point modulus of the keep thresholds (0.01 % granularity). */
  val Mod = 10000L

  /** Null semantics: rows with a NULL stratum or NULL unit are filtered
    * out at the ENTRANCE of both the rate derivation and the sample (and
    * the oracle's two CTEs mirror the filter), so the population n_exact
    * counts is exactly the population the keep-predicate can select from —
    * a null unit that were counted but never sampleable would silently
    * bias every estimate low, identically in both engines, where no gate
    * could see it. Callers who want null-keyed rows represented should
    * coalesce() to a sentinel first.
    * Overflow: `kept_sum · Mod` must fit a long — kept_sum is bounded by
    * ~targetK·max(value) per stratum by construction, so this holds
    * whenever per-row values stay below 2^63 / (targetK · 10⁴).
    */

  private val Salt = "cg:"

  /** Pure-Scala twin of the threshold derivation in [[rates]]' Column
    * expression (the two must change in lockstep; RatesSpec pins their
    * equality on a generated grid). Invariants (property-tested):
    * 1 ≤ bp ≤ Mod; bp = Mod iff n ≤ targetK; bp non-increasing in n; and
    * the expected survivors n·bp/Mod land in [targetK, targetK + n/Mod).
    */
  def bpFor(n: Long, targetK: Int): Long =
    if (n <= targetK) Mod
    else (targetK * Mod + n - 1L) / n

  /** The derived rate table: (stratum, n_exact, bp). `bp = Mod` (keep all)
    * when the stratum has ≤ targetK rows, else `ceil(targetK·Mod / n)` —
    * exact long arithmetic, and ≥ 1 for every n (a stratum is never
    * silently zeroed, however large). Callers composing manually must
    * pre-filter rows whose unit is NULL so n_exact counts the sampleable
    * population ([[sample]] does this for both frames).
    */
  def rates(df: DataFrame, stratum: Column, targetK: Int): DataFrame = {
    require(targetK >= 1, s"targetK must be >= 1, got $targetK")
    val kMod = targetK * Mod
    df.select(stratum.as("stratum"))
      .groupBy(col("stratum"))
      .agg(count(lit(1)).as("n_exact"))
      .withColumn(
        "bp",
        when(col("n_exact") <= targetK, lit(Mod))
          .otherwise(expr(s"(${kMod}L + n_exact - 1L) div n_exact")))
  }

  /** The congressional sample: rows surviving their stratum's derived
    * threshold, carrying (stratum, n_exact, bp) for downstream weighting.
    *
    * Unit choice sets the ATOMICITY (the [[UniverseSampled]] discipline):
    * unit = the row id samples rows independently; unit = a parent key
    * (user_id, doc_id, session) keeps every row of a kept parent and
    * drops every row of a dropped one — P(row kept) is bp/Mod either
    * way, so the per-row HT scale is unchanged and estimates stay
    * unbiased, while per-parent structure survives for downstream
    * session-level analyses (spec-pinned).
    *
    * The rate table rides a broadcast hint: it is |strata| rows — a
    * function of the STRATIFICATION SCHEME, not of corpus size (unlike
    * the vocabulary-growing sets the engine refuses to force-broadcast),
    * so it stays within the broadcast limit through ~10⁶ short-keyed
    * strata. The hint is what keeps the fact scan exchange-free in the
    * STATIC plan (AQE's runtime broadcast conversion would still have
    * written the fact table to shuffle files once before converting);
    * a stratification finer than the limit should drop the hint and pay
    * that one exchange.
    */
  def sample(df: DataFrame, stratum: Column, unit: Column, targetK: Int): DataFrame = {
    val base = df.filter(stratum.isNotNull && unit.isNotNull)
    sampleWithRates(base, stratum, unit, rates(base, stratum, targetK))
  }

  /** [[sample]] with an injected rate table — the seam the STREAMING form
    * rides ([[graft.streaming.StreamingCongressional]]): rates derived
    * once from a reference snapshot become the static side of a
    * stream-static broadcast join, and each arriving row's keep decision
    * is the same stateless hash-vs-threshold the batch path evaluates.
    * The caller owns null pre-filtering here (sample() does it; a stream
    * side does it in the wrapper).
    */
  def sampleWithRates(
      df: DataFrame, stratum: Column, unit: Column, ratesDf: DataFrame): DataFrame =
    df.withColumn("stratum", stratum)
      .join(broadcast(ratesDf), Seq("stratum"))
      .filter(
        Hashing.hash60(concat(lit(Salt), unit.cast("string"))) % Mod < col("bp"))

  /** Per-stratum estimate of `count(*)` and `sum(value)`: group-end HT
    * scaling (see object doc). Output: stratum, n_exact, bp, n_kept,
    * est_cnt, est_sum — complete strata (bp = Mod) report est == exact.
    * A stratum whose kept set comes up empty is ABSENT from the output —
    * the [[JoinSampled]] absent-group convention: an estimator reports
    * what it saw, identically in both engines. Expected survivors are
    * ~targetK, so absence probability is ≈ e^−targetK — negligible at the
    * default 300 but REAL at small targetK (≈ 37 % of sampled strata at
    * targetK = 1); callers joining estimates back to a dimension table
    * should size targetK with that in mind.
    */
  def estimate(
      df: DataFrame, stratum: Column, unit: Column, value: Column,
      targetK: Int): DataFrame =
    sample(df, stratum, unit, targetK)
      .withColumn("__v", value)
      .groupBy(col("stratum"), col("n_exact"), col("bp"))
      .agg(count(lit(1)).as("n_kept"), sum(col("__v")).as("kept_sum"))
      .select(
        col("stratum"), col("n_exact"), col("bp"), col("n_kept"),
        ((col("n_kept") * Mod).cast("double") / col("bp")).as("est_cnt"),
        ((col("kept_sum") * Mod).cast("double") / col("bp")).as("est_sum"))
      .orderBy(col("stratum"))

  /** [[estimate]] plus the reference's achieved-error bound PER STRATUM
    * ([[Stats.errorBound]], RandomSamplingUtil.java:376-378 semantics with
    * N = n_exact, n = n_kept): `err_bound = z · sqrt(0.25/n) ·
    * sqrt((N−n)/(N−1))`. Complete strata report 0 (their estimates are
    * exact); sampled strata all report ~z·sqrt(0.25/targetK) — the
    * congressional allocation's whole point made visible as a column:
    * UNIFORM error across groups of any size. Every term is a double
    * function of two already-exact integers evaluated in one fixed
    * order, so the bound itself replays bit-for-bit in the oracle.
    */
  def estimateWithBounds(
      df: DataFrame, stratum: Column, unit: Column, value: Column,
      targetK: Int, confidence: Double = 0.95): DataFrame =
    estimate(df, stratum, unit, value, targetK)
      .withColumn(
        "err_bound",
        Stats.errBoundCol(col("n_exact"), col("n_kept"), confidence))
      // no re-sort: withColumn is a projection atop estimate's orderBy

  /** DuckDB oracle for [[estimate]]: the count→ceil-div→threshold→hash-keep
    * →group-end-scale chain replayed as SQL over `fromSql`, with
    * `stratumSql`/`unitSql`/`valueSql` the expression spellings.
    */
  def estimateOracleSql(
      fromSql: String, stratumSql: String, unitSql: String, valueSql: String,
      targetK: Int): String =
    oracleSqlCore(fromSql, stratumSql, unitSql, valueSql, targetK, withBounds = false)

  /** DuckDB oracle for [[estimateWithBounds]] (confidence fixed at the
    * z-table bucket the Scala side was built with).
    */
  def estimateWithBoundsOracleSql(
      fromSql: String, stratumSql: String, unitSql: String, valueSql: String,
      targetK: Int, confidence: Double = 0.95): String =
    oracleSqlCore(fromSql, stratumSql, unitSql, valueSql, targetK,
      withBounds = true, confidence = confidence)

  /** The null pre-filter both oracle CTEs apply (mirrors [[sample]]). */
  private def notNullSql(stratumSql: String, unitSql: String): String =
    s"($stratumSql) IS NOT NULL AND ($unitSql) IS NOT NULL"

  /** The rate-derivation CTE body shared by every oracle builder — ONE
    * SQL spelling of [[rates]]/[[bpFor]], so the keep-set and estimate
    * oracles can never desynchronize.
    */
  private def ratesCteSql(
      fromSql: String, stratumSql: String, unitSql: String,
      targetK: Int): String = {
    val kMod = targetK * Mod
    s"""SELECT $stratumSql AS stratum, count(*) AS n_exact,
       |         CAST(CASE WHEN count(*) <= $targetK THEN $Mod
       |              ELSE ($kMod + count(*) - 1) // count(*) END AS BIGINT) AS bp
       |  FROM $fromSql WHERE ${notNullSql(stratumSql, unitSql)} GROUP BY 1""".stripMargin
  }

  /** DuckDB oracle for the KEEP SET itself (the [[sample]] stage —
    * gating the streaming replay): (id, stratum, n_exact, bp) of every
    * admitted row, ordered by id.
    */
  def keepSetOracleSql(
      fromSql: String, stratumSql: String, unitSql: String, idSql: String,
      targetK: Int): String = {
    val h = Hashing.hash60Sql(s"'$Salt' || CAST($unitSql AS VARCHAR)")
    s"""WITH r AS (
       |  ${ratesCteSql(fromSql, stratumSql, unitSql, targetK)}
       |), s AS (
       |  SELECT $stratumSql AS stratum, $idSql AS id, $h % $Mod AS h
       |  FROM $fromSql WHERE ${notNullSql(stratumSql, unitSql)}
       |)
       |SELECT s.id, s.stratum, r.n_exact, r.bp
       |FROM s JOIN r ON s.stratum = r.stratum
       |WHERE s.h < r.bp ORDER BY s.id""".stripMargin
  }

  private def oracleSqlCore(
      fromSql: String, stratumSql: String, unitSql: String, valueSql: String,
      targetK: Int, withBounds: Boolean, confidence: Double = 0.95): String = {
    val h = Hashing.hash60Sql(s"'$Salt' || CAST($unitSql AS VARCHAR)")
    // same operation ORDER as the Column spelling — double products are
    // evaluated left-to-right in both engines
    val boundCol =
      if (!withBounds) ""
      else
        s""",
           |       ${Stats.errBoundSql("r.n_exact", "count(*)", confidence)}
           |         AS err_bound""".stripMargin
    // both CTEs mirror sample()'s null pre-filter so n_exact counts
    // exactly the sampleable population (see the null-semantics doc)
    s"""WITH r AS (
       |  ${ratesCteSql(fromSql, stratumSql, unitSql, targetK)}
       |), s AS (
       |  SELECT $stratumSql AS stratum, $valueSql AS v, $h % $Mod AS h
       |  FROM $fromSql WHERE ${notNullSql(stratumSql, unitSql)}
       |)
       |SELECT s.stratum, r.n_exact, r.bp, count(*) AS n_kept,
       |       CAST(count(*) * $Mod AS DOUBLE) / r.bp AS est_cnt,
       |       CAST(sum(s.v) * $Mod AS DOUBLE) / r.bp AS est_sum$boundCol
       |FROM s JOIN r ON s.stratum = r.stratum
       |WHERE s.h < r.bp
       |GROUP BY 1, 2, 3 ORDER BY 1""".stripMargin
  }
}
