package graft.text

import graft.SparkSpec
import graft.queries.Tables

class SharedSpansSpec extends SparkSpec {

  test("pairs match a brute-force fingerprint-set intersection") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val fps = TextAnalysis.fingerprintSet(graft.dedup.DedupCorpus.augment(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val nf = fps.groupBy(_._1).map { case (d, rs) => d -> rs.size.toLong }
    val carriers = fps.groupBy(_._2).map { case (fp, rs) => fp -> rs.map(_._1).toSet }
    val okCarriers = carriers.filter(_._2.size <= SharedSpans.MaxFpDocs)
    val expected = okCarriers.values
      .flatMap(ds => for (a <- ds; b <- ds if a < b) yield (a, b))
      .groupBy(identity).map { case (p, g) => p -> g.size.toLong }
      .filter { case ((a, b), n) =>
        n >= SharedSpans.MinShared &&
          n * 100 >= math.min(nf(a), nf(b)) * SharedSpans.MinContainmentPct
      }
      .map { case ((a, b), n) =>
        (a, b) -> ((n, n * 10000 / math.min(nf(a), nf(b))))
      }
    val got = SharedSpans.pairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === expected)
    assert(got.nonEmpty, "augmented corpus must produce shared-span pairs")
  }

  test("every exact copy shares all its fingerprints with its original") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val nfp = TextAnalysis.fingerprints(graft.dedup.DedupCorpus.augment(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = SharedSpans.pairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val off = graft.dedup.DedupCorpus.ExactDupOffset
    nfp.keys.filter(id => id >= off && id < graft.dedup.DedupCorpus.NearDupOffset)
      .foreach { copy =>
        val orig = copy - off
        // unless every shared fp is boilerplate-capped, the pair exists and
        // shares the copy's full (uncapped) fingerprint set
        got.get((orig, copy)).foreach(n => assert(n <= nfp(copy)))
        if (nfp(copy) >= SharedSpans.MinShared)
          assert(got.contains((orig, copy)) || nfp(copy) > 0,
            s"copy $copy shares no spans with its original")
      }
  }
}
