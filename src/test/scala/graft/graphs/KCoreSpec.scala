package graft.graphs

import graft.SparkSpec
import graft.queries.Tables

/** [[KCore]] against an until-fixpoint brute-force peel, plus the
  * defining degree property and summary consistency.
  */
class KCoreSpec extends SparkSpec {

  private def bruteCore(
      edges: Set[(Long, Long)], k: Long): Set[(Long, Long)] = {
    var e = edges
    var changed = true
    while (changed) {
      val deg = e.toSeq.flatMap(p => Seq(p._1, p._2))
        .groupBy(identity).map { case (v, o) => v -> o.size.toLong }
      val keep = deg.filter(_._2 >= k).keySet
      val e2 = e.filter(p => keep(p._1) && keep(p._2))
      changed = e2 != e
      e = e2
    }
    e
  }

  test("5-round peel equals the until-fixpoint k-core on the fixture, degrees included") {
    val events = Tables.events(spark, sf001)
    val edges = Triangles.canonicalEdges(events)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.flatMap(p => Seq(p._1, p._2))
    val k = edges.size.toLong / nodes.size + 1
    val coreEdges = bruteCore(edges, k)
    val expected = coreEdges.toSeq.flatMap(p => Seq(p._1, p._2))
      .groupBy(identity).map { case (v, o) => (v, o.size.toLong) }
      .toSeq.sortBy(_._1)

    val got = KCore.core(events).orderBy("node").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected)
    // non-trivial on the fixture: something peeled, something survived
    assert(got.nonEmpty && got.length < nodes.size)
    // the defining property (holds because the fixture converges): every
    // surviving node keeps >= k in-core neighbors
    got.foreach { case (v, d) => assert(d >= k, s"node $v has in-core degree $d < $k") }
  }

  test("summary is consistent with the node listing and reports convergence") {
    val events = Tables.events(spark, sf001)
    val core = KCore.core(events).collect()
    val s = KCore.summary(events).collect().head
    val (k, nCore, mCore, conv) = (s.getLong(0), s.getLong(1), s.getLong(2), s.getInt(3))
    assert(nCore == core.length)
    assert(mCore == core.map(_.getLong(1)).sum / 2) // handshake
    assert(conv == 1, "fixture peel did not converge within 5 rounds")
    assert(k >= 2)
  }
}
