package graft.text

import graft.SparkSpec
import graft.queries.Tables

class GlobalShuffleSpec extends SparkSpec {

  test("positions form a permutation matching single-node hash order") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val got = GlobalShuffle.positions(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val n = docs.count()
    assert(got.length === n)
    // permutation: positions are exactly 1..N
    assert(got.map(_._2).sorted.toSeq === (1L to n).toSeq)
    // matches the independent driver-side derivation of the same order
    val hashed = docs.select(
      org.apache.spark.sql.functions.col("doc_id"),
      graft.dedup.Hashing.hash60(org.apache.spark.sql.functions.concat(
        org.apache.spark.sql.functions.lit(s"${GlobalShuffle.Seed}:"),
        org.apache.spark.sql.functions.col("doc_id").cast("string"))))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val expected = hashed.sortBy(x => (x._2, x._1)).zipWithIndex
      .map { case ((id, _), i) => id -> (i + 1L) }.toMap
    assert(got.map(t => t._1 -> t._2).toMap === expected)
    // shard is derived from pos, every shard at most ShardSize docs
    assert(got.forall { case (_, pos, shard) => shard === (pos - 1) / GlobalShuffle.ShardSize })
    val sizes = got.groupBy(_._3).map(_._2.length)
    assert(sizes.forall(_ <= GlobalShuffle.ShardSize))
  }

  test("range stage has non-overlapping h-ranges; ordinal window is pid-partitioned") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    // data-level proof of the range partitioner (the checkpoint truncates
    // lineage, so a plan-string pin of the exchange is unavailable): per-pid
    // (h, doc_id) spans must be disjoint and pid-ordered
    val spans = GlobalShuffle.ranged(docs).collect()
      .map(r => (r.getInt(2), (r.getLong(1), r.getLong(0))))
      .groupBy(_._1).toSeq.sortBy(_._1)
      .map { case (pid, rows) => (pid, rows.map(_._2).min, rows.map(_._2).max) }
    spans.sliding(2).foreach {
      case Seq((_, _, hi), (_, lo, _)) =>
        assert(Ordering[(Long, Long)].lt(hi, lo), s"overlapping ranges: $hi !< $lo")
      case _ =>
    }
    // the data-path window is partitioned (by pid), never global
    val plan = GlobalShuffle.positions(docs).queryExecution.executedPlan.toString
    assert(plan.contains("windowspecdefinition(pid"),
      s"expected the row_number window partitioned by pid in:\n$plan")
  }

  test("shard manifest covers every doc exactly once") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val man = GlobalShuffle.shardManifest(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(man.map(_._2).sum === docs.count())
    assert(man.forall(_._2 <= GlobalShuffle.ShardSize))
    // all but the last shard are full
    val full = man.sortBy(_._1).dropRight(1)
    assert(full.forall(_._2 === GlobalShuffle.ShardSize))
  }
}
