package graft.sampling

/** Statistical primitives of the approximate-query layer.
  *
  * Pure functions re-deriving the reference's sampling math
  * (reference: RandomSamplingUtil.java:331-382):
  *  - [[zScore]]        — piecewise confidence→z lookup (RandomSamplingUtil.java:331-374)
  *  - [[sampleRatio]]   — Cochran finite-population sample-size formula
  *                        (RandomSamplingUtil.java:380-382)
  *  - [[errorBound]]    — achieved error with finite-population correction
  *                        (RandomSamplingUtil.java:376-378)
  *
  * The z-table is kept byte-for-byte identical to the reference (rather than
  * an inverse-normal approximation) so reported error bounds are comparable.
  */
object Stats {

  /** Piecewise z-score lookup. Matches RandomSamplingUtil.java:331-374 exactly,
    * including the `<=` bucket boundaries and the 5.0 tail.
    */
  def zScore(confidence: Double): Double =
    if (confidence == 0) 0.0
    else if (confidence <= 0.05) 0.0627
    else if (confidence <= 0.10) 0.1257
    else if (confidence <= 0.15) 0.1891
    else if (confidence <= 0.20) 0.2533
    else if (confidence <= 0.25) 0.3186
    else if (confidence <= 0.30) 0.3853
    else if (confidence <= 0.40) 0.5244
    else if (confidence <= 0.50) 0.67
    else if (confidence <= 0.60) 0.84
    else if (confidence <= 0.70) 1.04
    else if (confidence <= 0.75) 1.15
    else if (confidence <= 0.80) 1.28
    else if (confidence <= 0.85) 1.44
    else if (confidence <= 0.90) 1.645
    else if (confidence <= 0.95) 1.96
    else if (confidence <= 0.98) 2.33
    else if (confidence <= 0.99) 2.575
    else if (confidence <= 0.995) 2.81
    else if (confidence <= 0.999) 3.09
    else 5.0

  /** Cochran finite-population sampling ratio for a target error bound at a
    * confidence level, with worst-case variance p(1-p)=0.25:
    *   ratio = 1 / (1 + 4·N·e² / z²)
    * (RandomSamplingUtil.java:380-382; N passed as 10^inputBits at :77.)
    */
  def sampleRatio(confidence: Double, errorBound: Double, population: Double): Double =
    1.0 / (1.0 + 4.0 * population * math.pow(errorBound, 2) / math.pow(zScore(confidence), 2))

  /** Achieved error bound for an observed (total, sampled) pair:
    *   e = z · sqrt(0.25/n) · sqrt((N-n)/(N-1))
    * (RandomSamplingUtil.java:376-378.)
    */
  def errorBound(confidence: Double, total: Long, sampled: Long): Double =
    math.sqrt(0.25 / sampled) * zScore(confidence) *
      math.sqrt((total - sampled).toDouble / (total - 1))

  /** [[errorBound]] as ONE in-plan Column spelling over (N, n) count
    * columns, with its SQL twin [[errBoundSql]] — the single T4 chain
    * every bounds estimator composes (JoinSampled's review discipline,
    * now shared with [[CongressionalSampled]] and the ratio ladder so a
    * third hand-copy can never drift). Fixed operation order
    * `z · sqrt(0.25/n) · sqrt((N−n)/(N−1))` — double products evaluate
    * left-to-right identically in Spark and DuckDB, so the bound replays
    * bit-for-bit. Degenerate populations (N ≤ 1: the FPC divides by zero)
    * and empty keeps (n < 1) report 0.
    */
  def errBoundCol(
      nTotal: org.apache.spark.sql.Column,
      nKept: org.apache.spark.sql.Column,
      confidence: Double): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, sqrt, when}
    when(nTotal <= 1 || nKept < 1, lit(0.0)).otherwise(
      lit(zScore(confidence))
        * sqrt(lit(0.25) / nKept)
        * sqrt((nTotal - nKept) / (nTotal - lit(1L))))
  }

  /** SQL twin of [[errBoundCol]] — `nTotalExpr`/`nKeptExpr` are SQL count
    * expressions; change in lockstep with the Column spelling.
    */
  def errBoundSql(nTotalExpr: String, nKeptExpr: String, confidence: Double): String =
    s"""CASE WHEN $nTotalExpr <= 1 OR $nKeptExpr < 1 THEN 0.0
       |            ELSE ${zScore(confidence)} * sqrt(0.25 / $nKeptExpr)
       |                 * sqrt(($nTotalExpr - $nKeptExpr)
       |                        / ($nTotalExpr - 1)) END""".stripMargin
}
