package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** Semantic specs for the dedup suite: the injected duplicates must actually
  * be found, with the right multiplicities/similarities — not just
  * hash-match an oracle.
  */
class DedupSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf001)
  private lazy val corpus = DedupCorpus.augment(docs)

  test("augment injects the right number of exact and near duplicates") {
    val n = docs.count()
    val exact = docs.filter(col("doc_id") % 7 === 0).count()
    val near = docs.filter(col("doc_id") % 11 === 0).count()
    assert(corpus.count() === n + exact + near)
  }

  test("augment ids are collision-free on live and probe-shaped fixtures") {
    // the documented precondition: no base id may equal another base id
    // plus either injection offset — a violation gives two texts one key
    // and silently fans out every downstream id join
    def assertNoDupIds(c: org.apache.spark.sql.DataFrame): Unit =
      assert(c.groupBy("doc_id").count().filter(col("count") > 1).count() === 0)
    assumeTestdata(sf001)
    assertNoDupIds(corpus)
    // probe-shaped fixture: two 1e8-spaced id blocks (the ScaleProbe
    // explodeDocs layout) — shifted ids land in the inter-block gap
    val exploded = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.select((col("doc_id") + 100000000L).as("doc_id"), col("text")))
    assertNoDupIds(DedupCorpus.augment(exploded))
  }

  test("exact dedup: every injected exact copy lands in a dup_cnt=2 group") {
    val out = DedupCorpus.exactDedup(corpus)
    val dupGroups = out.filter(col("dup_cnt") >= 2)
    val expected = docs.filter(col("doc_id") % 7 === 0).count()
    assert(dupGroups.count() === expected)
    // survivor is always the original (smallest doc_id)
    assert(dupGroups.filter(col("doc_id") >= DedupCorpus.ExactDupOffset).count() === 0)
  }

  test("minhash LSH finds every injected near-dup pair with high similarity") {
    val sigs = MinHashLSH.signatures(corpus)
    val pairs = MinHashLSH.nearDupPairs(sigs, minSim = 0.5)
    val injected = docs
      .filter(col("doc_id") % 11 === 0)
      .select(col("doc_id"))
      .collect()
      .map(_.getLong(0))
      .toSet
    val found = pairs
      .filter(col("doc_b") === col("doc_a") + DedupCorpus.NearDupOffset)
      .collect()
    val foundIds = found.map(_.getLong(0)).toSet
    assert(injected.subsetOf(foundIds),
      s"missed near-dups: ${(injected -- foundIds).take(5)}")
    // exact copies (doc % 77 = 0 both injected) have sim 1.0 is not required;
    // near-dups dropped only 2 words, so signature similarity should be high
    assert(found.map(_.getDouble(2)).min >= 0.5)
  }

  test("per-row (streaming-safe) signatures equal the batch explode+agg signatures") {
    val batch = MinHashLSH.signatures(corpus).orderBy("doc_id").collect()
    val perRow = MinHashLSH.signaturesPerRow(corpus).orderBy("doc_id").collect()
    assert(batch.sameElements(perRow))
  }

  test("minhash signature is permutation-stable (order of rows irrelevant)") {
    val a = MinHashLSH.signatures(corpus).orderBy("doc_id").collect()
    val b = MinHashLSH.signatures(corpus.orderBy(rand(1))).orderBy("doc_id").collect()
    assert(a.sameElements(b))
  }

  test("simhash: near-identical docs land within small hamming distance") {
    val fps = SimHash.fingerprints(corpus)
    val pairs = SimHash.nearDupPairs(fps, maxHamming = 3)
    // dropping 2 words from a ~100-word doc flips few sign sums → small
    // hamming; at least half of the injected near-dups must surface
    val near = pairs.filter(col("doc_b") === col("doc_a") + DedupCorpus.NearDupOffset).count()
    val injected = docs.filter(col("doc_id") % 11 === 0).count()
    assert(near >= injected / 2, s"simhash found only $near of $injected near-dups")
    // exact duplicates have identical fingerprints → hamming 0
    val exactPairs = pairs
      .filter(col("doc_a") < DedupCorpus.ExactDupOffset &&
        col("doc_b") === col("doc_a") + DedupCorpus.ExactDupOffset)
      .filter(col("hamming") === 0)
    assert(exactPairs.count() === docs.filter(col("doc_id") % 7 === 0).count())
  }

  test("ngram jaccard: injected near-dups score ≥ 0.7, exact dups score 1.0") {
    val pairs = JaccardPairs.nearDupPairs(corpus, minJaccard = 0.5)
    val nearScores = pairs
      .filter(col("doc_b") === col("doc_a") + DedupCorpus.NearDupOffset)
      .collect()
    assert(nearScores.length === docs.filter(col("doc_id") % 11 === 0).count())
    // shortest docs (~11 words) drop 2 of 9 shingles → 7/9 ≈ 0.78
    assert(nearScores.map(_.getDouble(2)).min >= 0.7)
    val exactScores = pairs
      .filter(col("doc_a") < DedupCorpus.ExactDupOffset &&
        col("doc_b") === col("doc_a") + DedupCorpus.ExactDupOffset)
      .collect()
    assert(exactScores.forall(_.getDouble(2) === 1.0))
  }
}
