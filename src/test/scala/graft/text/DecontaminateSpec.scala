package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** [[Decontaminate]] against a brute-force gram-overlap recomputation, plus
  * the broadcast-probe plan shape its 100 TB argument rests on.
  */
class DecontaminateSpec extends SparkSpec {

  private def grams(text: String): Set[String] = {
    val w = text.toLowerCase.split("[^a-z0-9]+", -1)
    if (w.length < Decontaminate.GramK) Set.empty
    else w.sliding(Decontaminate.GramK).map(_.mkString(" ")).toSet
  }

  test("clean keeps exactly the non-bench docs with no 8-gram overlap") {
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val benchGrams = docs
      .filter(_._1 % Decontaminate.BenchEvery == 0)
      .flatMap(d => grams(d._2)).toSet
    val expected = docs
      .filter(_._1 % Decontaminate.BenchEvery != 0)
      .filter(d => grams(d._2).intersect(benchGrams).isEmpty)
      .map(_._1).sorted
    val got = Decontaminate.clean(Tables.documents(spark, sf001))
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(got.toSeq == expected.toSeq)
    // sanity: the fixture actually exercises both outcomes
    val corpusSize = docs.count(_._1 % Decontaminate.BenchEvery != 0)
    assert(got.length < corpusSize, "no doc was flagged — fixture too clean")
    assert(got.nonEmpty)
  }

  test("the benchmark gram probe is a broadcast join") {
    // string check, not collect: AdaptiveSparkPlanExec hides its inner plan
    // from TreeNode.collect until stages materialize
    val plan = Decontaminate.clean(Tables.documents(spark, sf001))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no BroadcastHashJoin in:\n$plan")
  }

  test("bloom twin: no false negatives, and false positives only over-drop") {
    val exact = Decontaminate.clean(Tables.documents(spark, sf001))
      .collect().map(_.getLong(0)).toSet
    val bloom = Decontaminate.cleanBloom(Tables.documents(spark, sf001))
      .collect().map(_.getLong(0)).toSet
    // conservative direction: every doc the bloom keeps, the exact keeps —
    // a contaminated doc can NEVER survive (bloom has no false negatives)
    assert(bloom.subsetOf(exact))
    // the 7e-4-per-gram fp rate over-drops at most a sliver of the corpus
    val overDropped = exact -- bloom
    assert(overDropped.size <= exact.size / 20,
      s"bloom over-dropped ${overDropped.size} of ${exact.size} clean docs")
  }

  test("bloom_agg is merge-order invariant and probe-complete") {
    import graft.functions.BloomFilter
    val g = Tables.documents(spark, sf001)
      .select(graft.dedup.Hashing.hash60(col("text")).as("g"))
    val mLog = 14
    def bitsOf(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(BloomFilter.bloomAgg(col("g"), mLog, Decontaminate.BloomJ))
        .head().getSeq[Long](0)
    // partitioning must not change the bits (update/merge are an OR-lattice)
    val b1 = bitsOf(g.repartition(1))
    val b17 = bitsOf(g.repartition(17))
    assert(b1 === b17)
    assert(b1.length === (1 << (mLog - 6)))
    // every inserted value probes positive (no false negatives by law)
    val bits = b1.toArray
    val misses = g.filter(!BloomFilter.mightContain(col("g"), bits, Decontaminate.BloomJ))
    assert(misses.count() === 0)
  }

  test("the bloom gram probe is a map-side filter — no join on the gram side") {
    // the exact path pays a BroadcastHashJoin per gram; the bloom path's
    // grams meet only a literal bit table inside a projection, so the ONLY
    // joins in the plan are on doc_id (the contaminated anti-join) — the
    // plan-shape half of the 16x-smaller-broadcast claim
    val q = Decontaminate.cleanBloom(Tables.documents(spark, sf001))
    q.write.format("noop").mode("overwrite").save()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("bloom_might_contain"), plan.take(2000))
    val joinKeyLines = plan.linesIterator
      .filter(l => l.contains("Join") && !l.contains("doc_id")).toSeq
    assert(joinKeyLines.isEmpty, s"non-doc_id join in bloom plan:\n$joinKeyLines")
  }

  test("bloom width derivation: minimal power of two at BitsPerKey, clamped") {
    import Decontaminate.{mLogFor, BitsPerKey, MinMLog, MaxMLog}
    assert(mLogFor(0) === MinMLog)
    assert(mLogFor(64) === MinMLog) // 16*64 = 1024 = 2^10
    assert(mLogFor(65) === 11) // minimality
    assert(mLogFor(Long.MaxValue / BitsPerKey) === MaxMLog) // clamp
    val vals = (0 to 24).map(i => mLogFor(1L << i))
    assert(vals === vals.sorted) // monotone
    vals.foreach(m => assert((1L << m) >= 0 && m >= MinMLog && m <= MaxMLog))
  }

  test("fuzzy: injected copies of benchmark docs are dropped; bench docs never appear") {
    assumeTestdata(sf001)
    import graft.dedup.DedupCorpus
    val corpus = DedupCorpus.augment(Tables.documents(spark, sf001))
    val kept = Decontaminate.cleanFuzzy(corpus)
      .collect().map(_.getLong(0)).toSet
    // benchmark originals (id < ExactDupOffset, id % 50 == 0) are the eval
    // set — never part of the training output
    assert(kept.forall(id =>
      !(id < DedupCorpus.ExactDupOffset && id % Decontaminate.BenchEvery == 0)))
    // every AUGMENT copy of a benchmark doc is a train-side near-duplicate
    // of an eval doc — the paraphrased-leak shape — and must be dropped:
    // exact copies exist for id % 7 == 0, near-dup copies for id % 11 == 0
    val origIds = Tables.documents(spark, sf001)
      .select("doc_id").collect().map(_.getLong(0))
    val benchIds = origIds.filter(_ % Decontaminate.BenchEvery == 0).toSet
    val leakCopies =
      benchIds.filter(_ % 7 == 0).map(_ + DedupCorpus.ExactDupOffset) ++
        benchIds.filter(_ % 11 == 0).map(_ + DedupCorpus.NearDupOffset)
    assert(leakCopies.nonEmpty, "fixture lost its injected bench copies")
    val leaked = leakCopies.filter(kept)
    assert(leaked.isEmpty, s"near-dup leaks of eval docs survived: $leaked")
    // and the cleaner is not degenerate: the bulk of the train corpus
    // (no pair to any bench doc) survives
    assert(kept.size > origIds.length / 2)
  }

  test("fuzzy: cluster semantics survive the over-cap star topology (review scenario)") {
    import spark.implicits._
    // The pair family's star fallback connects an over-cap bucket through
    // its min-id representative ONLY — bench doc 50 pairs with rep 1, and
    // train members 2..9 pair with rep 1, never directly with 50. A
    // direct-pair contamination test keeps 2..9 (the recall hole the
    // review found); the cluster test drops the whole component.
    val ids = Seq(50L) ++ (1L to 9L) ++ Seq(60L, 61L) // 60,61: clean 2-cluster
    val corpus = ids.map(id => (id, s"text of $id")).toDF("doc_id", "text")
    val star = Seq((1L, 50L)) ++ (2L to 9L).map(m => (1L, m))
    val pairs = (star :+ ((60L, 61L))).toDF("doc_a", "doc_b")
    val kept = Decontaminate.cleanFuzzyWithPairs(corpus, pairs)
      .collect().map(_.getLong(0)).toSet
    // bench doc 50 excluded by role; its whole star cluster {1..9} dropped
    // as contaminated; the unrelated 2-cluster survives
    assert(kept === Set(60L, 61L),
      s"star members leaked past cluster decontamination: ${kept -- Set(60L, 61L)}")
  }

  test("overlap report matches a brute-force per-doc gram intersection") {
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val benchGrams = docs
      .filter(_._1 % Decontaminate.BenchEvery == 0)
      .flatMap(d => grams(d._2)).toSet
    val expected = docs
      .filter(_._1 % Decontaminate.BenchEvery != 0)
      .map { case (id, text) =>
        val g = grams(text)
        val shared = g.intersect(benchGrams).size.toLong
        val dirt = if (g.isEmpty) 0L else shared * 10000L / g.size
        (id, g.size.toLong, shared, dirt)
      }
      .sortBy(_._1)
    val got = Decontaminate.overlapReport(Tables.documents(spark, sf001))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    // fixture exercises both clean and dirty docs, and the report agrees
    // with the binary cleaner: clean == zero shared grams
    assert(got.exists(_._3 > 0) && got.exists(_._3 == 0))
    val cleanIds = Decontaminate.clean(Tables.documents(spark, sf001))
      .collect().map(_.getLong(0)).toSet
    got.foreach { case (id, _, shared, _) =>
      assert(cleanIds(id) == (shared == 0L),
        s"report/clean disagree on doc $id (n_shared=$shared)")
    }
  }
}
