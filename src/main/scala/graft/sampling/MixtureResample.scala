package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Domain-mixture resampling — materialize a training mixture from per-
  * source target weights (the data-mixing step every LLM pretraining run
  * performs: up-weight curated sources, down-weight bulk web, drop
  * blocklisted ones; cf. the mixture tables in GPT-3 (Brown et al. 2020
  * Table 2.2) and DoReMi (Xie et al. 2023), where weights are exactly such
  * static per-domain multipliers).
  *
  * A weight w (basis points, 10000 = ×1.0) emits, per document:
  *   - `floor(w)` whole copies (copy = 0 .. floor(w)-1), plus
  *   - one fractional copy iff a salted 60-bit hash of the unit lands below
  *     `frac(w)` of [[Mod]] residues — the [[UniverseSampled]] hash-range
  *     trick applied to the fractional remainder, so expected copies = w
  *     exactly and the decision is a pure function of the data.
  *
  * Weights below ×1.0 therefore downsample (floor = 0, keep-probability =
  * w), weights above replicate with an unbiased fractional tail, and weight
  * 0 drops the source entirely. Determinism gives the two properties the
  * RNG spelling (`rand(seed)` per copy) cannot: the DuckDB oracle replays
  * the EXACT output manifest, and a re-run over reshuffled input partitions
  * emits the identical mixture (safe under task retries and input
  * re-splits — the same argument as [[UniverseSampled]]).
  *
  * Scale shape: the whole operator is scan-fused — a CASE lookup for the
  * per-source constants, one md5 per row, `explode(sequence(...))` for the
  * copies. ZERO shuffles; output volume is `sum(w_s · |s|)` by
  * construction. At 100 TB the mixture materializes at scan speed, and
  * Catalyst prunes every column the downstream consumer doesn't read.
  * (Pipelines that only need mixture STATISTICS should aggregate the copy
  * counts without exploding; the manifest form here is the materialization
  * path.)
  *
  * The copy index is emitted so downstream epoch-aware consumers (sequence
  * packing, curriculum ordering) can distinguish replicas.
  */
object MixtureResample {

  /** Basis-point modulus: weights are integer bp (10000 = ×1.0). */
  val Mod = 10000L

  /** Hash salt — independent of the universe-sampling ("u:") and every
    * other hash60 use of the same unit column.
    */
  val Salt = "m:"

  /** Reference mixture for the declared query: up-sample src0 ×2.5,
    * down-sample src1 to ×0.3, drop src2; everything else passes ×1.0.
    */
  val DefaultWeightsBp: Map[String, Long] =
    Map("src0" -> 25000L, "src1" -> 3000L, "src2" -> 0L)

  val DefaultBp = 10000L

  private def caseLookup(stratum: Column, table: Map[String, Long], default: Long): Column =
    table.foldLeft(lit(default)) { case (acc, (k, v)) =>
      when(stratum === k, lit(v)).otherwise(acc)
    }

  /** Per-row copy count: floor(w) + the hash-range fractional copy. */
  def copyCount(
      stratum: Column,
      unit: Column,
      weightsBp: Map[String, Long],
      defaultBp: Long = DefaultBp): Column = {
    val whole = caseLookup(stratum, weightsBp.map { case (k, v) => k -> v / Mod }, defaultBp / Mod)
    val frac = caseLookup(stratum, weightsBp.map { case (k, v) => k -> v % Mod }, defaultBp % Mod)
    val fracHit = Hashing.hash60(concat(lit(Salt), unit.cast("string"))) % Mod < frac
    whole + when(fracHit, 1L).otherwise(0L)
  }

  /** The resampled-mixture manifest: (doc_id, source, copy) with copy in
    * [0, copies). Documents whose copy count is 0 are dropped. `extraCols`
    * ride along per replica (e.g. the pre-computed `tok` count for
    * [[graft.text.SequencePacking.packsMixture]] — still scan-fused, the
    * explode duplicates the row in the same stage). Carry compact DERIVED
    * columns, not the full text: anything copy-invariant should be computed
    * once before resampling, since the explode duplicates every carried
    * byte w× for an up-weighted source.
    */
  def resample(
      docs: DataFrame,
      weightsBp: Map[String, Long] = DefaultWeightsBp,
      defaultBp: Long = DefaultBp,
      extraCols: Seq[String] = Nil): DataFrame = {
    val n = copyCount(col("source"), col("doc_id"), weightsBp, defaultBp)
    val carried = Seq(col("doc_id"), col("source")) ++ extraCols.map(col)
    graft.queries.Tables.parallelismFloor(docs)
      .select(carried :+ n.as("__n"): _*)
      .filter(col("__n") > 0)
      .select(carried :+ explode(sequence(lit(0L), col("__n") - 1)).as("copy"): _*)
  }

  /** The manifest SELECT (no ORDER BY) — composable as a CTE body by
    * downstream oracles ([[resampleOracleSql]] and
    * [[graft.text.SequencePacking.packsMixtureOracleSql]]).
    */
  def manifestSql(
      weightsBp: Map[String, Long] = DefaultWeightsBp,
      defaultBp: Long = DefaultBp,
      extraCols: Seq[String] = Nil,
      from: String = "documents"): String = {
    def caseSql(f: Long => Long, default: Long): String =
      weightsBp.map { case (k, v) => s"WHEN '$k' THEN ${f(v)}" }
        .mkString("CASE source ", " ", s" ELSE $default END")
    val whole = caseSql(_ / Mod, defaultBp / Mod)
    val frac = caseSql(_ % Mod, defaultBp % Mod)
    val hash = Hashing.hash60Sql(s"'$Salt' || CAST(doc_id AS VARCHAR)")
    val extras = extraCols.map(c => s", $c").mkString
    s"""SELECT doc_id, source$extras, unnest(range(n)) AS copy
       |FROM (
       |  SELECT doc_id, source$extras,
       |         $whole + CASE WHEN $hash % $Mod < $frac THEN 1 ELSE 0 END AS n
       |  FROM $from
       |) WHERE n > 0""".stripMargin
  }

  /** DuckDB oracle for [[resample]] over the `documents` table. */
  def resampleOracleSql(
      weightsBp: Map[String, Long] = DefaultWeightsBp,
      defaultBp: Long = DefaultBp): String =
    manifestSql(weightsBp, defaultBp) + "\nORDER BY doc_id, copy"

  /** Salt for the temperature mixture's fractional copies — distinct from
    * [[Salt]] so the two mixture queries' keep-decisions are independent.
    */
  val TempSalt = "mt:"

  /** TEMPERATURE-scaled mixture weights, computed FROM the corpus instead
    * of a hand-written table: per-source sampling proportion ∝ n_s^(1/2),
    * renormalized so the mixture's expected size equals the corpus size —
    * the standard low-resource up-weighting of multilingual pretraining
    * (mC4/mT5, Xue et al. 2021; XLM-R, Conneau et al. 2020: p_s ∝ n_s^α
    * with α < 1 flattens the source distribution so bulk sources stop
    * drowning rare ones).
    *
    * The exponent is FIXED at α = 1/2 because IEEE-754 `sqrt` is the one
    * exactly-rounded power primitive — `floor(sqrt(double(n)))` is
    * bit-identical in the JVM and C libm for any n < 2⁵³, so the weight
    * table is engine-exact without float `pow` (which carries no such
    * guarantee; other α would need an integer k-th-root). The sqrt is
    * quantized to an integer BEFORE normalization, and the final weight is
    * one integer expression, `(n_tot · sq_s · 10⁴) DIV (s_tot · n_s)` bp
    * (longs — exact while n_tot·sq_s < 9·10¹⁴, i.e. far past any testable
    * corpus; a 100 TB deployment promotes the two totals to decimal).
    *
    * Output: (source, n_s, w_bp). One tiny aggregate + a one-row total —
    * both broadcast-sized at any corpus scale (sources are a dimension).
    */
  def temperatureWeights(docs: DataFrame): DataFrame = {
    val n = docs.groupBy(col("source")).agg(count(lit(1)).as("n_s"))
    val sq = n.withColumn("sq_s", floor(sqrt(col("n_s").cast("double"))).cast("long"))
    val tot = sq.agg(sum(col("n_s")).as("n_tot"), sum(col("sq_s")).as("s_tot"))
    sq.crossJoin(broadcast(tot))
      .select(col("source"), col("n_s"),
        expr(s"(n_tot * sq_s * $Mod) div (s_tot * n_s)").as("w_bp"))
  }

  /** [[resample]] under the data-derived [[temperatureWeights]]: the
    * weight table rides a broadcast join instead of a CASE literal (it is
    * computed in-plan — no driver round-trip), then the same
    * floor + hash-range fractional-copy explode. Output: (doc_id, source,
    * w_bp, copy).
    */
  def resampleTemperature(docs: DataFrame): DataFrame = {
    val w = temperatureWeights(docs).select(col("source"), col("w_bp"))
    val fracHit =
      Hashing.hash60(concat(lit(TempSalt), col("doc_id").cast("string"))) % Mod <
        col("w_bp") % Mod
    graft.queries.Tables.parallelismFloor(docs)
      .join(broadcast(w), Seq("source"))
      .select(col("doc_id"), col("source"), col("w_bp"),
        (expr(s"w_bp div $Mod") + when(fracHit, 1L).otherwise(0L)).as("__n"))
      .filter(col("__n") > 0)
      .select(col("doc_id"), col("source"), col("w_bp"),
        explode(sequence(lit(0L), col("__n") - 1)).as("copy"))
      .orderBy(col("doc_id"), col("copy"))
  }

  /** DuckDB oracle for [[resampleTemperature]]. */
  def resampleTemperatureOracleSql: String = {
    val hash = Hashing.hash60Sql(s"'$TempSalt' || CAST(doc_id AS VARCHAR)")
    s"""WITH n AS (SELECT source, count(*) AS n_s FROM documents GROUP BY 1),
       |sq AS (SELECT source, CAST(n_s AS BIGINT) AS n_s,
       |              CAST(floor(sqrt(CAST(n_s AS DOUBLE))) AS BIGINT) AS sq_s
       |       FROM n),
       |t AS (SELECT CAST(sum(n_s) AS BIGINT) AS n_tot,
       |             CAST(sum(sq_s) AS BIGINT) AS s_tot FROM sq),
       |w AS (SELECT source, (n_tot * sq_s * $Mod) // (s_tot * n_s) AS w_bp
       |      FROM sq, t),
       |c AS (SELECT d.doc_id, d.source, w.w_bp,
       |             w.w_bp // $Mod +
       |               CASE WHEN $hash % $Mod < w.w_bp % $Mod THEN 1 ELSE 0 END AS n
       |      FROM documents d JOIN w ON d.source = w.source)
       |SELECT doc_id, source, w_bp, unnest(range(n)) AS copy
       |FROM c WHERE n > 0
       |ORDER BY doc_id, copy""".stripMargin
  }
}
