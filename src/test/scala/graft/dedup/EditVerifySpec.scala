package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec

class EditVerifySpec extends SparkSpec {
  import spark.implicits._

  /** Classic DP edit distance, independent of both engines. */
  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(
        math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("distances match an independent DP; confirm rule is the 20% band") {
    val corpus = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumped over the lazy dog"),
      (3L, "a completely different sentence about ships"),
      (4L, "the quick brown fox jumps over the lazy dog")
    ).toDF("doc_id", "text")
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val texts = corpus.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val out = EditVerify.verifiedPairs(corpus, pairs).collect()
    out.foreach { r =>
      val (a, b) = (texts(r.getLong(0)), texts(r.getLong(1)))
      val expect = lev(a, b)
      assert(r.getLong(2) === expect.toLong, s"pair (${r.getLong(0)},${r.getLong(1)})")
      assert(r.getBoolean(3) === (expect * 5 <= math.max(a.length, b.length)))
    }
    // the exact copy confirms at distance 0; the unrelated pair does not
    val byPair = out.map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getBoolean(3))).toMap
    assert(byPair((1L, 4L)) === ((0L, true)))
    assert(!byPair((1L, 3L))._2)
  }

  test("the DP projection materializes at shuffle width, not AQE-coalesced") {
    // Regression guard for the single-task-Levenshtein defect: the pair
    // rows are tiny in bytes but O(|a|·|b|) in CPU, so AQE's byte-based
    // coalescing must NOT be allowed to collapse the verification stage.
    // The checkpoint below the final sort is what the plan's Sort scans,
    // so the leaf RDD's partition count IS the width the DP ran at.
    val out = EditVerify.verifiedMinHashPairs(
      graft.queries.Tables.documents(spark, sf001))
    out.count() // materialize the lazy checkpoint
    // AdaptiveSparkPlanExec is leaf-like to collectLeaves — unwrap it
    val plan = out.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    val leaves = plan.collectLeaves()
    val rddLeaf = leaves.collectFirst {
      case r: org.apache.spark.sql.execution.RDDScanExec => r
    }
    assert(rddLeaf.nonEmpty, s"expected a checkpointed RDD leaf, got: $leaves")
    val parts = spark.sessionState.conf.numShufflePartitions
    assert(rddLeaf.get.inputRDD.getNumPartitions === parts,
      "DP stage width must equal spark.sql.shuffle.partitions (explicit " +
        "repartition opted out of AQE coalescing)")
  }

  test("live corpus: every injected exact-dup candidate pair confirms") {
    val out = EditVerify.verifiedMinHashPairs(
      graft.queries.Tables.documents(spark, sf001))
    val rows = out.collect()
    assert(rows.nonEmpty)
    // exact dups (ORIGINAL doc vs its + ExactDupOffset verbatim copy) are
    // distance 0 — doc_a must be an original, else (copy-of-x, near-dup-
    // of-x) id arithmetic aliases into this filter
    val exact = rows.filter(r =>
      r.getLong(0) < DedupCorpus.ExactDupOffset &&
        r.getLong(1) == r.getLong(0) + DedupCorpus.ExactDupOffset)
    assert(exact.nonEmpty, "no exact-dup pairs in the candidate set")
    exact.foreach(r => assert(r.getLong(2) === 0L && r.getBoolean(3)))
  }
}
