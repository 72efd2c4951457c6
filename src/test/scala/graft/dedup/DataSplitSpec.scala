package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class DataSplitSpec extends SparkSpec {
  import spark.implicits._

  test("hand-built graph: every cluster member inherits the representative's verdict") {
    val corpus = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("doc_a", "doc_b")
    val out = DataSplit.assignWithPairs(corpus, pairs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 4L, 5L))
    // the chain 1-2-3 is one cluster: all three share rep 1 and its verdict
    assert(out(2L) === out(1L))
    assert(out(3L) === out(1L))
    // the verdict is the hash function of the rep, nothing else
    val expected1 = spark.range(1).select(DataSplit.splitCol(lit(1L))).head().getString(0)
    assert(out(1L)._2 === expected1)
  }

  test("no near-dup pair straddles a split boundary (live corpus, full pair table)") {
    assumeTestdata(sf001)
    val corpus = DedupCorpus.augment(Tables.documents(spark, sf001))
    val pairs = MinHashLSH.nearDupPairs(MinHashLSH.signatures(corpus))
    val a = DataSplit.assignWithPairs(corpus, pairs)
      .select(col("doc_id"), col("split"))
    val straddlers = pairs
      .join(a.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("split", "sa"), "doc_a")
      .join(a.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("split", "sb"), "doc_b")
      .filter(col("sa") =!= col("sb"))
      .count()
    assert(straddlers === 0L)
  }

  test("assignment is total, deterministic, and roughly 90/5/5 (live corpus)") {
    assumeTestdata(sf001)
    val corpus = DedupCorpus.augment(Tables.documents(spark, sf001))
    val a1 = DataSplit.assign(corpus).orderBy("doc_id").collect()
    val a2 = DataSplit.assign(corpus).orderBy("doc_id").collect()
    assert(a1.sameElements(a2)) // replayable: retries keep every verdict
    assert(a1.length.toLong === corpus.count()) // total: every doc gets a verdict
    val bydSplit = a1.groupBy(_.getString(2)).view.mapValues(_.length).toMap
    val n = a1.length.toDouble
    // cluster-atomicity makes the proportions noisier than iid per-doc
    // draws (the unit is the cluster); a wide band still catches a broken
    // threshold or hash while staying stable across fixture regenerations
    assert(bydSplit.getOrElse("train", 0) / n > 0.75,
      s"train share collapsed: $bydSplit")
    assert(bydSplit.getOrElse("val", 0) + bydSplit.getOrElse("test", 0) > 0,
      s"no holdout rows at all: $bydSplit")
  }

  test("summary partitions the corpus exactly: doc/char mass adds up") {
    assumeTestdata(sf001)
    val corpus = DedupCorpus.augment(Tables.documents(spark, sf001))
    val s = DataSplit.summary(corpus).collect()
    assert(s.map(_.getString(0)).toSet.subsetOf(Set("train", "val", "test")))
    val totalDocs = s.map(_.getLong(1)).sum
    val totalChars = s.map(_.getLong(3)).sum
    val expect = corpus.agg(
      count(lit(1)), sum(length(col("text")).cast("long"))).head()
    assert(totalDocs === expect.getLong(0))
    assert(totalChars === expect.getLong(1))
  }

  test("incremental: a bridging smaller-id newcomer does NOT flip a saved cluster's verdict") {
    // snapshot 1: docs {5,6} form a cluster (rep 5); doc 9 is a singleton
    val snap1 = Seq(5L, 6L, 9L).toDF("doc_id")
    val pairs1 = Seq((5L, 6L)).toDF("doc_a", "doc_b")
    val saved = DataSplit.assignWithPairs(snap1, pairs1)
      .select(col("doc_id"), col("split"))
    val savedMap = saved.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // snapshot 2: doc 1 arrives and bridges INTO the {5,6} cluster with a
    // SMALLER id — re-deriving from scratch would re-key the rep 5 -> 1
    // and re-hash every verdict; the inherit path must not
    val snap2 = Seq(1L, 5L, 6L, 9L).toDF("doc_id")
    val pairs2 = Seq((1L, 5L), (5L, 6L)).toDF("doc_a", "doc_b")
    val out = DataSplit.assignIncrementalWithPairs(snap2, pairs2, saved)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3))))
      .toMap
    // the cluster IS re-keyed (rep = 1 now) — but saved docs keep their
    // shipped verdicts verbatim and the newcomer inherits, so nothing flips
    assert(out(5L)._1 === 1L)
    assert(out(5L)._2 === savedMap(5L) && out(5L)._3 === "saved")
    assert(out(6L)._2 === savedMap(6L) && out(6L)._3 === "saved")
    assert(out(9L)._2 === savedMap(9L) && out(9L)._3 === "saved")
    assert(out(1L)._2 === savedMap(5L) && out(1L)._3 === "inherited")
    // contrast: a from-scratch re-derivation DOES hash the new rep (1),
    // giving doc 5 the rep-1 verdict — the exact hazard the persisted
    // path removes; asserted for real against assignWithPairs (review
    // finding: the previous disjunction was a tautology)
    val fresh1 = spark.range(1).select(DataSplit.splitCol(lit(1L))).head().getString(0)
    val scratch = DataSplit.assignWithPairs(snap2, pairs2)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(scratch(5L) === fresh1)
    if (fresh1 != savedMap(5L))
      assert(scratch(5L) != out(5L)._2,
        "from-scratch re-derivation should diverge from the inherit path here")
  }

  test("incremental: never-seen clusters hash fresh; saved coverage is exact (live corpus)") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    val saved = spark.read.parquet(DataSplit.ensureSavedAssignment(spark, sf001))
    val corpus = DedupCorpus.augment(docs)
    val out = DataSplit.assignIncremental(corpus, saved)
    val byOrigin = out.groupBy("origin").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every saved doc survives into snapshot 2 here (the delta only ADDS
    // docs), so 'saved' coverage equals the saved table exactly
    assert(byOrigin.getOrElse("saved", 0L) === saved.count())
    assert(out.count() === corpus.count())
    // fresh rows are hashed by the NEW rep — and only fresh rows are:
    // re-running with the same saved table reproduces everything
    val again = DataSplit.assignIncremental(corpus, saved)
    assert(out.orderBy("doc_id").collect()
      .sameElements(again.orderBy("doc_id").collect()))
    // a saved doc's verdict always matches the saved table (no flips)
    val flips = out.join(
      saved.withColumnRenamed("split", "saved_split"), Seq("doc_id"))
      .filter(col("split") =!= col("saved_split")).count()
    assert(flips === 0L)
  }
}
