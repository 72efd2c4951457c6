package graft.graphs

import graft.SparkSpec
import graft.queries.Tables

/** Pins the integer fixed-point PageRank against an independent naive
  * driver-side implementation of the same arithmetic — a second, shuffle-
  * free derivation of every rank value, so a Spark-side join/agg mistake
  * cannot agree with it by construction. The DuckDB oracle is the third
  * derivation (driver gate).
  */
class PageRankSpec extends SparkSpec {

  /** Reference implementation: same integer recurrence, plain Scala maps. */
  private def naiveRanks(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val out = edges.groupBy(_._1).map { case (s, es) => s -> es.size.toLong }
    val inEdges = edges.groupBy(_._2)
    var ranks: Map[Long, Long] = out.keys.map(_ -> PageRank.Scale).toMap
    for (_ <- 1 to iters) {
      ranks = inEdges.map { case (dst, es) =>
        val s = es.iterator.map { case (src, _) => ranks(src) / out(src) }.sum
        dst -> (PageRank.BaseMass + (85L * s) / 100L)
      }
    }
    ranks
  }

  test("ranks match the naive integer recurrence on the sf0.001 graph") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val edges = PageRank.edges(events).collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val expected = naiveRanks(edges, PageRank.Iterations)
    val got = PageRank.ranks(events).collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size === expected.size)
    assert(got === expected)
  }

  test("rank mass stays within the damped envelope and ordering finds hubs") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val got = PageRank.ranks(events).collect().map(r => r.getLong(0) -> r.getLong(1))
    val n = got.length.toLong
    val mass = got.map(_._2).sum
    // total mass is conserved up to integer-floor loss and the no-dangling
    // variant: strictly positive, at most the initial N·Scale
    assert(mass > n * PageRank.BaseMass)
    assert(mass <= n * PageRank.Scale)
    // the max-degree node must outrank the median node
    val deg = PageRank.edges(events).collect().groupBy(_.getLong(0)).map { case (k, v) => k -> v.length }
    val hub = deg.maxBy(_._2)._1
    val ranksByNode = got.toMap
    val median = got.map(_._2).sorted.apply(got.length / 2)
    assert(ranksByNode(hub) > median)
  }

  test("degree histogram counts every node once") {
    assumeTestdata(sf001)
    val events = Tables.events(spark, sf001)
    val hist = PageRank.degreeHistogram(events).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val nodes = PageRank.edges(events).select("src").distinct().count()
    assert(hist.values.sum === nodes)
    assert(hist.keys.forall(_ >= 1L))
  }

  test("oracle SQL unrolls the declared iteration count") {
    val sql = PageRank.ranksOracleSql()
    assert(sql.contains(s"FROM r${PageRank.Iterations}"))
    assert((1 to PageRank.Iterations).forall(i => sql.contains(s"r$i AS")))
    assert(sql.contains("// 100")) // integer division, not float
  }
}
