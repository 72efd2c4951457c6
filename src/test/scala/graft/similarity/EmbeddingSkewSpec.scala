package graft.similarity

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Skew-guard specs for the sign-LSH embedding family — the
  * [[graft.dedup.DedupSkewSpec]] scenario transplanted to vectors: a
  * corpus with hundreds of IDENTICAL embeddings (constant boilerplate
  * encoded over and over — routine at 100 TB) defeats the derived plane
  * budget, because identical vectors produce identical sign bits at ANY
  * plane count, so one bucket goes quadratic no matter how the width
  * scales. These tests pin that
  *  (a) uncapped candidate generation really is quadratic on such a
  *      corpus (the guard guards something),
  *  (b) the [[SimilaritySearch.MaxBucket]] cap bounds it to LINEAR star
  *      pairs against the bucket's min-id representative, with the
  *      mega-cluster still fully covered through the rep, and
  *  (c) the k-NN graph keeps every mega-bucket member reachable (each
  *      member retains the representative as a neighbor, and the rep
  *      ranks its k nearest members) instead of drowning in b² candidate
  *      rows.
  */
class EmbeddingSkewSpec extends SparkSpec {
  import spark.implicits._

  private val NIdentical = 600L
  require(NIdentical > SimilaritySearch.MaxBucket,
    "fixture must overflow the cap")

  /** 600 identical vectors (ids 0..599) + 6 mutually-distinct ones
    * (ids 1000..1005); labels cycle so classify has something to vote on.
    */
  private lazy val degenerate: DataFrame = {
    val boiler = (0 until SimilaritySearch.Dims).map(_ => 0.5f)
    val identical = (0L until NIdentical).map(i => (i, i % 3, boiler))
    val distinct = (0L until 6L).map { i =>
      val v = (0 until SimilaritySearch.Dims)
        .map(d => (((i * 31 + d * 7) % 13).toFloat - 6.0f) / 10.0f)
      (1000L + i, 7L, v)
    }
    (identical ++ distinct).toDF("vec_id", "label", "embedding")
  }

  test("nearDupPairs: uncapped candidate generation is quadratic on identical vectors") {
    val uncapped = SimilaritySearch.nearDupPairs(degenerate, maxBucket = Long.MaxValue)
    // identical vectors share a bucket and every pair has sim 1.0 >= 0.15
    assert(uncapped.count() >= NIdentical * (NIdentical - 1) / 2)
  }

  test("nearDupPairs: over-cap bucket falls back to linear star pairs, cluster stays whole") {
    val capped = SimilaritySearch.nearDupPairs(degenerate)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    // one star pair per non-rep hot-bucket member, plus at most the dense
    // pairs of the 6 distinct vectors — linear, not the >=179 700 rows of
    // the dense self-join
    assert(capped.length <= (NIdentical - 1) + 6 * 5 / 2 + 6,
      s"capped pair count ${capped.length} is not linear in the cluster")
    val star = capped.filter { case (a, _, _) => a == 0L }
    // every identical member pairs with the min-id representative at 1.0
    assert(star.count(_._3 == 1.0) === (NIdentical - 1).toInt)
    assert((1L until NIdentical).toSet.subsetOf(star.map(_._2).toSet),
      "star pairs must cover the whole identical cluster through the rep")
  }

  test("nearDupPairs: derived-band path applies the same cap") {
    val capped = SimilaritySearch.nearDupPairsDerived(degenerate, minSim = 0.15, numBands = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(capped.length <= (NIdentical - 1) + 6 * 5 / 2 + 6)
    assert((1L until NIdentical).map(m => (0L, m)).toSet.subsetOf(capped.toSet))
  }

  test("knn graph: mega-bucket members keep the representative as a neighbor") {
    val rows = KnnGraph.graph(degenerate)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    // the representative ranks its K nearest members: all sims are 1.0 so
    // the tie-break (neighbor_id asc) selects members 1..K
    val repRows = rows.filter(_._1 == 0L)
    assert(repRows.map(_._2).toSet === (1L to KnnGraph.K).toSet)
    assert(repRows.forall(_._3 == 1.0))
    // every non-rep identical member's single candidate is the rep, at rn 1
    val memberRows = rows.filter(r => r._1 > 0L && r._1 < NIdentical)
    assert(memberRows.length === (NIdentical - 1).toInt)
    assert(memberRows.forall(r => r._2 == 0L && r._3 == 1.0 && r._4 == 1L))
  }

  test("caps are a no-op on the live fixture (CORRECTNESS parity untouched)") {
    assumeTestdata(sf001)
    val emb = graft.queries.Tables.embeddings(spark, sf001)
    val capped = SimilaritySearch.nearDupPairs(emb)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val uncapped = SimilaritySearch.nearDupPairs(emb, maxBucket = Long.MaxValue)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(capped === uncapped)
  }
}
