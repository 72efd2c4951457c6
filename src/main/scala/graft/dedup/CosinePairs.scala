package graft.dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact WEIGHTED-COSINE near-duplicate pairs over sparse tf-idf shingle
  * vectors via L2-prefix-filtered candidate generation — the weighted
  * sibling of [[JaccardPairs]] and the problem Bayardo et al. (WWW'07,
  * "Scaling Up All Pairs Similarity Search") actually posed: documents as
  * integer tf-idf vectors over word-[[ShingleK]]-gram features
  * (`w = min(tf, TfCap)·1000 div df`, the [[graft.text.TfIdf]] fixed-point
  * convention with sublinear-tf saturation — see [[TfCap]]; Jaccard sees
  * the shingle SET — this weights repeated
  * shingles by count and rare shingles by idf), pairs with `cos(a,b) ≥ t`
  * where the numerator is an exact integer dot product and only the final
  * norm division is IEEE double — the embedding-cosine exactness
  * discipline, so the DuckDB oracle replays every value.
  *
  * Candidate generation (lossless): features sort under the global
  * ascending `(df, g)` rarity order — the idf-heavy weights concentrate
  * early — and each doc exposes only its PREFIX: the minimal head whose
  * remaining suffix has `‖suffix‖ < t·‖x‖` (one integer
  * suffix-square-sum scan per doc). For any pair with `cos ≥ t`, the
  * EARLIEST shared feature must lie in both prefixes: were it outside
  * prefix(a), every shared feature would sit in a's suffix, giving
  * `dot ≤ ‖suffix(a)‖·‖b‖ < t·‖a‖·‖b‖` by Cauchy–Schwarz — so the prefix
  * equi-join has no false negatives (the double-precision cut carries a
  * `1−1e-9` slack toward LONGER prefixes; slack only admits extra
  * candidates, which verification discards).
  *
  * Scale design (100 TB): the stopword/boilerplate cut is a CORPUS
  * FRACTION derived in-plan from the live count ([[maxDfFor]]: df ≤ 20 %
  * of docs, floor [[MinDfCap]]) — an ABSOLUTE cap is the scale-divergence
  * trap this round's audit kept finding (at 100× corpus a fixed cap guts
  * the surviving vocabulary; measured on the word-vocab variant of this
  * operator: sf0.1 reported ZERO pairs). Cut features leave the vector
  * space entirely — both the `Σ df²` posting-skew guard and standard
  * tf-idf practice; the metric is DEFINED over the surviving vocabulary,
  * identically in the oracle. Verification is the streaming
  * zero-allocation
  * [[graft.functions.SortedIntersectDot sorted_intersect_dot]] merge per
  * candidate — no pair-keyed aggregation state anywhere (the
  * [[JaccardPairs]] memory-flatness argument). Document text never
  * shuffles; arrays carry 8-byte hashes and fixed-point weights.
  */
object CosinePairs {

  val MinCosine = 0.8

  /** Shingle width — the [[JaccardPairs.ShingleK]] feature space. */
  val ShingleK = 3

  /** Boilerplate cut, percent of corpus: features in more than this
    * fraction of documents leave the vector space (df² posting skew AND
    * near-zero idf discrimination).
    */
  val MaxDfPct = 20L

  /** df-cut floor: below ~[[MinDfCap]]/[[MaxDfPct]]·100 docs a percentage
    * cut would start deleting the discriminative features themselves.
    */
  val MinDfCap = 16L

  /** Fixed-point weight scale: `w = min(tf, TfCap)·WScale div df`. */
  val WScale = 1000L

  /** Term-frequency saturation cap — standard sublinear-tf practice (a
    * shingle's 10,000th repetition says nothing its 1,000th didn't; the
    * BM25 family saturates tf for the same reason) AND the Int64-overflow
    * guard the integer-exact discipline needs: uncapped, a pathological
    * log-dump doc repeating a corpus-unique shingle ~10⁶ times gets
    * `w = tf·WScale/1 ≈ 10⁹`, so a handful of `w²` terms wrap the BIGINT
    * `norm_sq` negative and the `norm_sq > 0` filter silently drops the
    * doc — the silent-recall-collapse failure class this round's audits
    * kept finding, invisible on clean fixtures. Capped, `w ≤ TfCap·WScale
    * = 10⁶`, so `norm_sq = Σw² ≤ 10¹²·|features|` stays in Int64 headroom
    * below ~9·10⁶ distinct shingles per document (a ~9M-word document),
    * and every pair dot is bounded by the norms via Cauchy–Schwarz. The
    * oracle applies the identical `least` in its weight CTE.
    */
  val TfCap = 1000L

  /** The derived df cut: `max(MinDfCap, n·MaxDfPct/100)` over the live
    * corpus count — pure integer math, replayed by the oracle's
    * `greatest(...)` over the same `count(*)`.
    */
  def maxDfFor(n: Long): Long = math.max(MinDfCap, n * MaxDfPct / 100L)

  /** Pairs with exact weighted cosine ≥ `minCosine` over the
    * df ≤ [[maxDfFor]] tf-idf shingle space. Output:
    * (doc_a, doc_b, cosine), doc_a < doc_b.
    */
  def nearDupPairs(
      corpus: DataFrame,
      minCosine: Double = MinCosine): DataFrame = {
    val t2 = minCosine * minCosine
    // one count job at plan-build time — the [[PlaneBudget.bandBitsFor]]
    // convention for live-derived widths (column-pruned scan, the same
    // cost class as AQE runtime statistics; an in-plan one-row cross-join
    // would plan as the BroadcastNestedLoopJoin this operator's plan spec
    // forbids)
    val maxDf = maxDfFor(corpus.count())
    val tf = Hashing.explodeShingles(corpus, ShingleK)
      .select(col("doc_id"), Hashing.hash60(col("shingle")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("g").agg(count(lit(1)).as("df"))
      .filter(col("df") <= maxDf)
    val weighted = tf.join(df, Seq("g"))
      .select(col("doc_id"), col("g"), col("df"),
        expr(s"least(tf, $TfCap) * $WScale div df").as("w"))
    // per-doc vector, rarity-ordered; norm and prefix length from one
    // integer suffix-square scan (reversed array: the maximal initial run
    // of the COMMON end whose cumulative squared mass stays under
    // t²·normSq is exactly the prunable suffix)
    val docarr = weighted.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("g"), col("w")))).as("sarr"))
      .withColumn("norm_sq",
        expr("aggregate(sarr, CAST(0 AS BIGINT), (acc, x) -> acc + x.w * x.w)"))
      .filter(col("norm_sq") > 0)
      .withColumn("pref_len", expr(
        s"""size(sarr) - aggregate(
           |  reverse(sarr),
           |  named_struct('s', CAST(0 AS BIGINT), 'k', 0),
           |  (acc, x) -> named_struct(
           |    's', acc.s + x.w * x.w,
           |    'k', CASE WHEN CAST(acc.s + x.w * x.w AS DOUBLE)
           |                   < $t2 * CAST(norm_sq AS DOUBLE) * ${1.0 - 1e-9}
           |              THEN acc.k + 1 ELSE acc.k END)).k""".stripMargin))
      // g-ascending aligned (keys, weights) views for the merge-dot
      .withColumn("gw",
        array_sort(expr("transform(sarr, x -> named_struct('g', x.g, 'w', x.w))")))
      .select(col("doc_id"),
        expr("transform(gw, x -> x.g)").as("gs"),
        expr("transform(gw, x -> x.w)").as("ws"),
        expr("slice(transform(sarr, x -> x.g), 1, pref_len)").as("parr"),
        col("norm_sq"))
      .localCheckpoint(false) // feeds candidate generation + both verify joins
    val prefix = docarr.select(col("doc_id"), explode(col("parr")).as("g"))
    val cand = prefix.as("a").join(prefix.as("b"), Seq("g"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    cand
      .join(docarr.select(col("doc_id").as("doc_a"), col("gs").as("ga"),
        col("ws").as("wa"), col("norm_sq").as("nsq_a")), "doc_a")
      .join(docarr.select(col("doc_id").as("doc_b"), col("gs").as("gb"),
        col("ws").as("wb"), col("norm_sq").as("nsq_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"),
        graft.functions.SortedIntersectDot
          .sortedIntersectDot(col("ga"), col("wa"), col("gb"), col("wb")).as("dot"),
        col("nsq_a"), col("nsq_b"))
      .select(col("doc_a"), col("doc_b"),
        (col("dot").cast("double") /
          (sqrt(col("nsq_a").cast("double")) * sqrt(col("nsq_b").cast("double"))))
          .as("cosine"))
      .filter(col("cosine") >= minCosine)
  }

  /** Oracle SQL for [[nearDupPairs]] over the augmented dedup corpus.
    * Stated as the plain posting-list self-join — the prefix filtering in
    * the Spark plan is lossless, so the RESULT sets must be identical;
    * the oracle deliberately takes the independent spelling (the
    * [[JaccardPairs]] oracle convention), replaying the df-cut derivation
    * over the same live `count(*)`.
    */
  def nearDupPairsOracleSql(minCosine: Double = MinCosine): String =
    s"""WITH corpus AS (${DedupCorpus.augmentSql}),
       |mx AS (SELECT greatest($MinDfCap,
       |                       (SELECT count(*) FROM corpus) * $MaxDfPct // 100) AS maxdf),
       |tf AS (
       |  SELECT doc_id, ${Hashing.hash60Sql("shingle")} AS g, count(*) AS tf
       |  FROM (
       |    SELECT doc_id,
       |           unnest([array_to_string(w[i:i+${ShingleK - 1}], ' ')
       |                   for i in range(1, len(w) - ${ShingleK - 2})]) AS shingle
       |    FROM (SELECT doc_id, regexp_split_to_array(lower(text), '[^a-z0-9]+') AS w
       |          FROM corpus)
       |  )
       |  GROUP BY 1, 2
       |),
       |dfq AS (SELECT g, count(*) AS df FROM tf GROUP BY 1
       |        HAVING count(*) <= (SELECT maxdf FROM mx)),
       |wt AS (
       |  SELECT doc_id, g, least(tf, $TfCap) * $WScale // df AS w
       |  FROM tf JOIN dfq USING (g)
       |),
       |norms AS (
       |  SELECT doc_id, SUM(w * w) AS nsq FROM wt GROUP BY 1 HAVING SUM(w * w) > 0
       |),
       |shared AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.w * b.w) AS dot
       |  FROM wt a JOIN wt b ON a.g = b.g AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |)
       |SELECT doc_a, doc_b,
       |       CAST(dot AS DOUBLE) /
       |         (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) AS cosine
       |FROM shared
       |JOIN norms na ON doc_a = na.doc_id
       |JOIN norms nb ON doc_b = nb.doc_id
       |WHERE CAST(dot AS DOUBLE) /
       |        (sqrt(CAST(na.nsq AS DOUBLE)) * sqrt(CAST(nb.nsq AS DOUBLE))) >= $minCosine
       |ORDER BY doc_a, doc_b""".stripMargin
}
