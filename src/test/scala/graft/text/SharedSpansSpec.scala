package graft.text

import graft.SparkSpec
import graft.queries.Tables

class SharedSpansSpec extends SparkSpec {

  test("pairs match a brute-force fingerprint-set intersection") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val fps = TextAnalysis.fingerprintSet(graft.dedup.DedupCorpus.augment(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val carriers = fps.groupBy(_._2).map { case (fp, rs) => fp -> rs.map(_._1).toSet }
    val okCarriers = carriers.filter(_._2.size <= SharedSpans.MaxFpDocs)
    // containment denominators count SURVIVING (sub-cap) fingerprints
    val okFpSet = okCarriers.keySet
    val nf = fps.filter(p => okFpSet(p._2))
      .groupBy(_._1).map { case (d, rs) => d -> rs.size.toLong }
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

  test("every exact copy with enough distinctive spans pairs with its original at 10^4 bp") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val fps = TextAnalysis.fingerprintSet(graft.dedup.DedupCorpus.augment(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val hot = fps.groupBy(_._2).collect {
      case (fp, rs) if rs.map(_._1).distinct.size > SharedSpans.MaxFpDocs => fp
    }.toSet
    // surviving (sub-cap) fingerprints per doc — the containment space
    val surv = fps.filterNot(p => hot(p._2))
      .groupBy(_._1).map { case (d, rs) => d -> rs.size.toLong }
    val got = SharedSpans.pairs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    val off = graft.dedup.DedupCorpus.ExactDupOffset
    val copies = surv.keys
      .filter(id => id >= off && id < graft.dedup.DedupCorpus.NearDupOffset)
    assert(copies.nonEmpty)
    copies.foreach { copy =>
      val orig = copy - off
      // an exact copy's surviving fp set EQUALS its original's, so the
      // pair must be reported at full containment whenever it has at
      // least MinShared distinctive fingerprints — the recall guarantee
      // the r14 denominator fix restores at any boilerplate fraction
      if (surv(copy) >= SharedSpans.MinShared) {
        assert(got.contains((orig, copy)),
          s"exact copy $copy not paired with its original")
        assert(got((orig, copy)) === ((surv(copy), 10000L)))
      }
    }
  }
}
