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
}
