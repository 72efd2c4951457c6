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
}
