package graft.dedup

import graft.SparkSpec
import graft.queries.Tables

class IncrementalDedupSpec extends SparkSpec {

  test("exact copies of indexed originals hit the index at m=16") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val matched = IncrementalDedup.matches(spark, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val matchedBy = matched.map(t => t._1 -> t).toMap
    // delta-side exact copies whose ORIGINAL is in the base index: the copy
    // must score a full-signature hit (m = 16). The matched base_id need
    // not be the original — distinct-but-near-identical base docs can share
    // all 16 minima, and ties break to the smallest id — so the pin is the
    // full-agreement score, the strongest claim MinHash itself makes.
    val sigable = MinHashLSH.signatures(DedupCorpus.augment(docs))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val baseExactCopies = sigable.filter { id =>
      id >= DedupCorpus.ExactDupOffset && id < DedupCorpus.NearDupOffset &&
        (id - DedupCorpus.ExactDupOffset) % IncrementalDedup.DeltaMod != 0
    }
    assert(baseExactCopies.nonEmpty, "fixture must contain base-indexed exact copies")
    baseExactCopies.foreach { id =>
      val hit = matchedBy.get(id)
      assert(hit.isDefined, s"exact copy $id found no index match")
      assert(hit.get._3 === 16L, s"exact copy $id matched at m=${hit.get._3}")
    }
  }

  test("novel and matched partition the delta batch") {
    assumeTestdata(sf001)
    val delta = IncrementalDedup.deltaCorpus(Tables.documents(spark, sf001))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val matched = IncrementalDedup.matches(spark, sf001).collect().map(_.getLong(0)).toSet
    val novel = IncrementalDedup.novel(spark, sf001).collect().map(_.getLong(0)).toSet
    assert(matched.subsetOf(delta))
    assert(novel.subsetOf(delta))
    assert((matched & novel).isEmpty)
    assert((matched | novel) === delta)
    // delta originals are novel by construction (their text is new)
    val deltaOriginals = delta.filter(_ < DedupCorpus.ExactDupOffset)
    assert(deltaOriginals.nonEmpty)
  }
}
