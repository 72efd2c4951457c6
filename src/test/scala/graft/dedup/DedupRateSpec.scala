package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables
import graft.sampling.SamplingConfig

class DedupRateSpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = DedupCorpus.augment(
    Tables.documents(spark, sf001).select(col("doc_id"), col("text")))

  test("exact stats: hand-checked on a tiny corpus") {
    val tiny = Seq((1L, "aa"), (2L, "aa"), (3L, "bb"), (4L, "aa")).toDF("doc_id", "text")
    val r = DedupRate.rateStats(tiny).head()
    assert(r.getAs[Long]("n_docs") === 4L)
    assert(r.getAs[Long]("n_distinct") === 2L)
    assert(r.getAs[Long]("n_dup_docs") === 2L)
    assert(r.getAs[Double]("dup_rate") === 0.5)
  }

  test("universe sample keeps or drops each content-hash cluster atomically") {
    val sampleHashes = DedupRate.universeSample(corpus, 10)
      .select(Hashing.hash60(col("text")).as("h")).distinct()
      .collect().map(_.getLong(0)).toSet
    val allClusters = corpus
      .select(Hashing.hash60(col("text")).as("h"))
      .groupBy("h").agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // every cluster is in iff its hash is in the range — no partial clusters
    allClusters.foreach { case (h, _) =>
      assert(sampleHashes.contains(h) === (h % DedupRate.RangeMod < 10))
    }
  }

  test("universe estimator tracks the corpus dup rate; Bernoulli row sampling " +
    "understates it (the reason universe sampling exists)") {
    val exact = DedupRate.rateStats(corpus).head()
    val trueRate = exact.getAs[Double]("dup_rate")
    assert(trueRate > 0.0) // augment injects duplicates

    val est = DedupRate.rateStatsSampled(corpus, 10).head()
    val estRate = est.getAs[Double]("dup_rate")
    // deterministic (content-hash predicate): cluster-level sampling noise
    // only — the estimate sits near the truth
    assert(math.abs(estRate - trueRate) <= 0.6 * trueRate,
      s"universe estimate $estRate vs true $trueRate")
    // HT-scaled doc count tracks the corpus size
    val nTrue = exact.getAs[Long]("n_docs").toDouble
    assert(math.abs(est.getAs[Double]("est_n_docs") - nTrue) <= 0.5 * nTrue)

    // the foil: a seeded 10 % ROW sample — dup pairs survive with p², so
    // its measured rate collapses toward p · trueRate
    val rowSample = graft.sampling.Sampled(corpus, SamplingConfig(ratio = 0.1)).data
    val rowRate = DedupRate.rateStats(rowSample).head().getAs[Double]("dup_rate")
    assert(rowRate < 0.5 * trueRate,
      s"row-sample rate $rowRate should understate true $trueRate")
  }

  test("cluster-size histogram: exact twin hand-checked on a tiny corpus") {
    import spark.implicits._
    // three singletons, one pair, one triple → hist {1:3, 2:1, 3:1}
    val corpus = Seq(
      (1L, "a"), (2L, "b"), (3L, "c"),
      (4L, "dup"), (5L, "dup"),
      (6L, "tri"), (7L, "tri"), (8L, "tri")).toDF("doc_id", "text")
    val hist = DedupRate.clusterSizeHist(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(hist === Map(1L -> 3L, 2L -> 1L, 3L -> 1L))
  }

  test("sampled histogram at pct=100 reproduces the exact histogram (identity weights)") {
    val corpus = DedupCorpus.augment(Tables.documents(spark, sf001))
    val exact = DedupRate.clusterSizeHist(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = DedupRate.clusterSizeHistSampledU(corpus, pct = 100)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est === exact)
  }

  test("second-order HT histogram estimator tracks truth at pct=10") {
    // deterministic draw (hash-range keep-set), so these are fixed numbers,
    // not a flaky stochastic bound: the estimator must land within a factor
    // the sparse 10% draw supports, and the doc-count identity Σ k·N̂ₖ must
    // stay in the same ballpark as the true doc count
    val corpus = DedupCorpus.augment(Tables.documents(spark, sf001))
    val exact = DedupRate.clusterSizeHist(corpus)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = DedupRate.clusterSizeHistSampledU(corpus, pct = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // singleton count dominates and concentrates: within ±50%
    assert(est.contains(1L) && exact.contains(1L))
    assert(math.abs(est(1L).toDouble / exact(1L) - 1.0) < 0.5,
      s"size-1 estimate ${est(1L)} vs true ${exact(1L)}")
    val trueDocs = exact.map { case (k, n) => k * n }.sum.toDouble
    val estDocs = est.map { case (k, n) => k * n }.sum.toDouble
    assert(math.abs(estDocs / trueDocs - 1.0) < 0.5,
      s"doc mass $estDocs vs true $trueDocs")
  }

  test("histogram weight table is the exact binomial inverse (B·A = I) for m=10") {
    val m = 10L
    val w = DedupRate.histWeights(m)
      .map { case (j, k, v) => (j, k) -> v }.toMap
    def choose(n: Int, r: Int): Double =
      (1 to r).foldLeft(1.0)((acc, i) => acc * (n - r + i) / i)
    val p = 1.0 / m
    // Σⱼ A(k,j)·B(j,t) = δ(k,t) where B(j,t) = C(t,j)·pʲ·q^(t−j)
    for (k <- 1 to DedupRate.MaxHistSize; t <- 1 to DedupRate.MaxHistSize) {
      val s = (1 to DedupRate.MaxHistSize).map { j =>
        val a = w.getOrElse((j, k), 0L).toDouble * math.pow(p, j.toDouble)
        val b = choose(t, j) * math.pow(1 - p, (t - j).toDouble)
        if (j <= t) a * b else 0.0
      }.sum
      val expect = if (k == t) 1.0 else 0.0
      assert(math.abs(s - expect) < 1e-9, s"(k=$k,t=$t) got $s")
    }
  }

  test("live corpus never outgrows the weight table's MaxHistSize") {
    for (dir <- Seq(sf001, sf01)) {
      val corpus = DedupCorpus.augment(Tables.documents(spark, dir))
      val maxSize = DedupRate.clusterSizeHist(corpus)
        .agg(org.apache.spark.sql.functions.max("cluster_size")).head().getLong(0)
      assert(maxSize <= DedupRate.MaxHistSize,
        s"$dir max cluster size $maxSize exceeds table bound ${DedupRate.MaxHistSize}: widen it")
    }
  }
}
