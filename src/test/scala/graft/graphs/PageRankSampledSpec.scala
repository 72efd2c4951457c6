package graft.graphs

import graft.SparkSpec
import graft.queries.Tables

/** Estimator-vs-truth for the graph family's edge-atomic sampled twins
  * (VERDICT r13 item 8): the HT identities that must hold by construction
  * (pct=100 degeneracy, edge atomicity, integer weights) are asserted
  * exactly; the pct=10 estimates are checked against ground truth on the
  * live fixture within loose relative bounds (the draw is deterministic —
  * md5 keep-predicate — so these are stable pins, not flaky tolerances).
  */
class PageRankSampledSpec extends SparkSpec {

  test("pct=100 degenerates to the exact statistics") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val exactHist = PageRank.degreeHistogram(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val fullHist = PageRank.degreeHistogramSampledU(events, pct = 100).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fullHist === exactHist) // m = 1: est_degree == degree
    val exact = PageRank.graphMoments(events).collect().head
    val full = PageRank.graphMomentsSampledU(events, pct = 100).collect().head
    assert(full.getLong(0) === exact.getLong(0))
    assert(full.getLong(1) === exact.getLong(1))
    assert(full.getLong(2) === exact.getLong(2))
  }

  test("the sample is edge-atomic: both orientations survive together") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val s = PageRank.sampledEdges(events, pct = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(s.nonEmpty)
    s.foreach { case (a, b) => assert(s.contains((b, a))) }
  }

  test("pct=10 HT moments track ground truth on the live fixture") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val exact = PageRank.graphMoments(events).collect().head
    val est = PageRank.graphMomentsSampledU(events, pct = 10).collect().head
    // est_sum_deg is unbiased with relative sd ~ sqrt((m-1)/E); the md5
    // draw on this fixture must land within 50 % — a broken predicate or
    // a wrong weight (m instead of m², a directional split) misses by far
    // more (m-fold), so the bound separates correct from wrong sharply
    def rel(a: Long, b: Long): Double = math.abs(a - b).toDouble / b
    assert(rel(est.getLong(1), exact.getLong(1)) < 0.5,
      s"est_sum_deg ${est.getLong(1)} vs ${exact.getLong(1)}")
    assert(rel(est.getLong(2), exact.getLong(2)) < 0.8,
      s"est_wedges ${est.getLong(2)} vs ${exact.getLong(2)}")
    // captured nodes can only undercount (capture prob 1-(1-p)^d < 1)
    assert(est.getLong(0) <= exact.getLong(0))
  }

  test("pct=10 HT degree-histogram mass is consistent with est_sum_deg") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val hist = PageRank.degreeHistogramSampledU(events, pct = 10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val moments = PageRank.graphMomentsSampledU(events, pct = 10).collect().head
    // sum over bins of est_degree * nodes == m * (surviving directed edges)
    // == est_sum_deg — two spellings of the same HT total
    assert(hist.map { case (d, n) => d * n }.sum === moments.getLong(1))
    // every bin is a positive multiple of m = 10
    assert(hist.forall { case (d, _) => d >= 10 && d % 10 == 0 })
  }
}
