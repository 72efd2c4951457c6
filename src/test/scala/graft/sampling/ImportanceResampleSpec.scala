package graft.sampling

import graft.SparkSpec
import graft.queries.Tables

class ImportanceResampleSpec extends SparkSpec {

  test("scores are in [0, Scale] and rank target-language docs above the rest") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val scores = ImportanceResample.scores(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(scores.values.forall(s => s >= 0L && s <= ImportanceResample.Scale))
    val langs = docs.select("doc_id", "lang").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    def mean(ids: Iterable[Long]) = {
      val v = ids.flatMap(scores.get)
      v.sum.toDouble / v.size
    }
    val en = langs.filter(_._2 == ImportanceResample.TargetLang).keys
    val rest = langs.filterNot(_._2 == ImportanceResample.TargetLang).keys
    assert(mean(en) > mean(rest),
      s"target-language mean ${mean(en)} should exceed non-target ${mean(rest)}")
  }

  test("resample keeps a subset with rate tracking the mean score") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val scores = ImportanceResample.scores(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val kept = ImportanceResample.resample(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(kept.keySet.subsetOf(scores.keySet))
    kept.foreach { case (id, s) => assert(scores(id) === s) }
    val expectedRate = scores.values.sum.toDouble / (scores.size * ImportanceResample.Scale)
    val gotRate = kept.size.toDouble / scores.size
    assert(math.abs(gotRate - expectedRate) < 0.1,
      s"keep rate $gotRate vs score-implied $expectedRate")
    // determinism: the keep decision is a pure hash function
    val again = ImportanceResample.resample(docs).collect()
      .map(r => r.getLong(0)).toSet
    assert(again === kept.keySet)
  }
}
