package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Universe (hash-range) sampling: keep a row iff a deterministic 60-bit
  * content hash of its sampling UNIT lands in the first `pct` of
  * [[RangeMod]] residues — the Quickr-style universe sample (Kandula et
  * al., "Quickr: Lazily Approximating Complex AdHoc Queries in BigData
  * Clusters", SIGMOD 2016 §4) beside the seeded Bernoulli sampler
  * ([[Sampled]]).
  *
  * Two properties the Bernoulli sampler cannot offer:
  *
  *  1. '''Replayability.''' The predicate is a pure function of the data
  *     (md5-prefix hash, no RNG), so an external engine can reproduce the
  *     EXACT sampled row set — these are the only sampled queries the
  *     DuckDB oracle fully hash-gates, converting the engine's AQP core
  *     from spec-trusted to oracle-proven
  *     ([[graft.dedup.DedupRate]] proved the pattern in r8; this module
  *     generalizes it to the word-count/wireless/TPC-H/stratified/token-
  *     budget families).
  *  2. '''Unit atomicity.''' All rows sharing a unit value are kept or
  *     dropped together, so per-unit structure (duplicate clusters, join
  *     keys) survives sampling intact — the reason [[graft.dedup.DedupRate]]
  *     samples by content hash and Quickr samples join inputs by key.
  *
  * Scale shape: identical to the Bernoulli path — the predicate is a
  * codegen'd scan-stage filter (md5 of a short key string per row), so
  * 1−p of a 100 TB corpus never leaves the scan loop, and Catalyst prunes
  * columns below it. Horvitz–Thompson scale-up is the same ×(1/p); the
  * trade-off vs `rand(seed)` is paying one md5 per row for determinism.
  *
  * The unit hash is salted (`"u:"`) so this sampling decision is
  * independent of every other hash60 use of the same column (MinHash
  * seeds, token-budget ordering, DedupRate's content ranges).
  */
object UniverseSampled {

  /** Residue modulus (percent granularity). */
  val RangeMod = 100L

  private val Salt = "u:"

  /** Keep-predicate: hash of the salted unit in [0, pct). */
  def keep(unit: Column, pct: Int): Column =
    Hashing.hash60(concat(lit(Salt), unit.cast("string"))) % RangeMod < pct

  /** DuckDB text of [[keep]] for oracle generation; `unitExpr` is a SQL
    * expression for the unit column (cast to VARCHAR here, mirroring the
    * Spark-side string cast).
    */
  def keepSql(unitExpr: String, pct: Int): String =
    s"${Hashing.hash60Sql(s"'$Salt' || CAST($unitExpr AS VARCHAR)")} % $RangeMod < $pct"

  /** The `pct`-percent universe sample of `df` by `unit`. */
  def sample(df: DataFrame, unit: Column, pct: Int): DataFrame =
    df.filter(keep(unit, pct))

  /** Horvitz–Thompson scale factor 1/p (exact in IEEE 754 for the divisors
    * of 100 used here).
    */
  def scale(pct: Int): Double = RangeMod.toDouble / pct

  /** SQL literal of [[scale]] — e.g. "10.0", so `count(*) * 10.0` is a
    * DOUBLE in DuckDB exactly like Spark's `cnt * lit(10.0)`.
    */
  def scaleSql(pct: Int): String = scale(pct).toString
}
