package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class SourceOverlapSpec extends SparkSpec {

  test("source overlap matrix matches a brute-force recompute of the pair table") {
    val docs = Tables.documents(spark, sf001)
    val corpus = DedupCorpus.augment(docs)
    val pairs = MinHashLSH.nearDupPairs(MinHashLSH.signatures(corpus))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val srcs = DedupCorpus.augmentSources(docs)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expected = pairs
      .map { case (a, b, sim) =>
        val (lo, hi) = {
          val (sa, sb) = (srcs(a), srcs(b))
          if (sa <= sb) (sa, sb) else (sb, sa)
        }
        ((lo, hi), sim)
      }
      .groupBy(_._1)
      .map { case (k, vs) => k -> ((vs.size.toLong, vs.map(_._2).sum / vs.size)) }
    val got = SourceOverlap.pairsBySource(docs)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === expected.keySet)
    got.foreach { case (k, (cnt, avg)) =>
      assert(cnt === expected(k)._1)
      // MinHash sims are multiples of 1/16, so sums are exact dyadics —
      // but Spark's avg divides the partial-sum merge order-independently
      // while the reference sums left-to-right; allow 1 ulp-ish slack
      assert(math.abs(avg - expected(k)._2) < 1e-12, s"$k: $avg vs ${expected(k)._2}")
    }
    // conservation: every pair lands in exactly one cell
    assert(got.values.map(_._1).sum === pairs.length.toLong)
    spark.catalog.clearCache()
  }

  test("sampled HT estimator: mixed-order weights verified against a hand recompute") {
    val pct = 10
    val docs = Tables.documents(spark, sf001)
    val sampled = graft.sampling.UniverseSampled.sample(docs, col("doc_id"), pct)
    val pairs = MinHashLSH.nearDupPairs(
      MinHashLSH.signatures(DedupCorpus.augment(sampled)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val srcs = DedupCorpus.augmentSources(sampled)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    def base(id: Long): Long =
      if (id >= DedupCorpus.NearDupOffset) id - DedupCorpus.NearDupOffset
      else if (id >= DedupCorpus.ExactDupOffset) id - DedupCorpus.ExactDupOffset
      else id
    val expected = pairs
      .map { case (a, b, sim) =>
        val (sa, sb) = (srcs(a), srcs(b))
        val k = if (sa <= sb) (sa, sb) else (sb, sa)
        val w = if (base(a) == base(b)) 10L else 100L
        (k, w, sim)
      }
      .groupBy(_._1)
      .map { case (k, vs) =>
        val wsum = vs.map(_._2).sum
        k -> ((wsum, vs.map(v => v._2.toDouble * v._3).sum / wsum.toDouble))
      }
    val got = SourceOverlap.pairsBySourceSampled(docs, pct)
      .collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3))))
      .toMap
    assert(got.keySet === expected.keySet)
    assert(got.nonEmpty) // a 10 % slice of the fixture still has dup pairs
    got.foreach { case (k, (cnt, avg)) =>
      assert(cnt === expected(k)._1)
      assert(math.abs(avg - expected(k)._2) < 1e-12, s"$k: $avg vs ${expected(k)._2}")
    }
    // same-base pairs exist in the slice (the injected copies travel with
    // their base under doc-atomic sampling), so both weight orders are
    // actually exercised: some cell must NOT be a multiple of 100
    assert(got.values.exists(_._1 % 100L != 0L))
    spark.catalog.clearCache()
  }

  test("plan shapes: id-keyed joins only — no cartesian product in either query") {
    val docs = Tables.documents(spark, sf001)
    Seq(
      SourceOverlap.pairsBySource(docs),
      SourceOverlap.pairsBySourceSampled(docs),
      DedupClusters.canonicalByQuality(DedupCorpus.augment(docs))
    ).foreach { q =>
      val plan = q.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan.take(2000))
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
    }
  }

  test("matrix is canonically ordered (upper-triangular) and provenance covers dups") {
    val docs = Tables.documents(spark, sf001)
    val out = SourceOverlap.pairsBySource(docs).collect()
    assert(out.nonEmpty) // the injected duplicates guarantee pairs exist
    out.foreach(r => assert(r.getString(0) <= r.getString(1)))
    // the augmented lookup labels every id the pair table can produce
    val corpusIds = DedupCorpus.augment(docs).select("doc_id")
    val srcIds = DedupCorpus.augmentSources(docs).select("doc_id")
    assert(corpusIds.exceptAll(srcIds).count() === 0)
    spark.catalog.clearCache()
  }
}
