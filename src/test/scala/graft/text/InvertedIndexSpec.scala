package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** [[InvertedIndex]]: search correctness vs a brute-force tokenization,
  * driver/plan bucket-derivation lockstep, saved-artifact reuse, and the
  * partition-pruned scan the 100 TB story rests on.
  */
class InvertedIndexSpec extends SparkSpec {

  private def docsOf = Tables.documents(spark, sf001)

  private def tokens(text: String): Seq[String] =
    text.toLowerCase.split("[^a-z0-9]+", -1).toSeq.filter(_.nonEmpty)

  test("conjunctive search equals brute force, tf mass included") {
    val docs = docsOf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val terms = InvertedIndex.QueryTerms.distinct
    val expected = docs.flatMap { case (id, text) =>
      val tf = tokens(text).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
      if (terms.forall(tf.contains)) Some((id, terms.map(tf).sum)) else None
    }.sortBy(_._1)
    val got = InvertedIndex.searchAnd(spark, docsOf, sf001)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty, "fixture search came back empty")
    // and the conjunction is genuinely selective (not a full-corpus echo)
    assert(got.length < docs.length / 2)
  }

  test("driver-side bucketOf is lockstep with the plan's hash60 bucket over the live vocabulary") {
    val vocab = InvertedIndex.postings(docsOf)
      .select(col("term"), col("b")).distinct()
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(vocab.nonEmpty)
    vocab.foreach { case (term, b) =>
      assert(InvertedIndex.bucketOf(term) == b,
        s"driver/plan bucket drift for term '$term'")
    }
  }

  test("saved index: built once, reused, and the search scan prunes to the query buckets") {
    val p1 = InvertedIndex.ensureSavedIndex(spark, docsOf, sf001)
    val stamp = new java.io.File(s"$p1/_SUCCESS").lastModified()
    val p2 = InvertedIndex.ensureSavedIndex(spark, docsOf, sf001)
    assert(p1 == p2)
    assert(new java.io.File(s"$p2/_SUCCESS").lastModified() == stamp,
      "second ensure rebuilt the artifact")
    assert(new java.io.File(p1).listFiles().exists(_.getName.startsWith("b=")),
      "index is not bucket-partitioned on disk")

    val q = InvertedIndex.searchAnd(spark, docsOf, sf001)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(scanLine.contains("b#") || scanLine.contains("(b"),
      s"no bucket partition filter in scan: $scanLine")
  }

  test("ranked OR search equals brute-force integer tf-idf, and ranks without a global sort") {
    val docs = docsOf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val terms = InvertedIndex.QueryTerms.distinct
    val tfByDoc = docs.map { case (id, text) =>
      id -> tokens(text).groupBy(identity).map { case (t, o) => t -> o.size.toLong }
    }
    val dfs = terms.map(t => t -> tfByDoc.count(_._2.contains(t)).toLong).toMap
    val expected = tfByDoc
      .flatMap { case (id, tf) =>
        val matched = terms.filter(tf.contains)
        if (matched.isEmpty) None
        else Some((id, matched.map(t => tf(t) * 1000000L / dfs(t)).sum))
      }
      .sortBy { case (id, score) => (-score, id) }
      .take(InvertedIndex.RankK)
    val q = InvertedIndex.searchRanked(spark, docsOf, sf001)
    val got = q.collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty)
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), plan.take(2000))
  }

  private def phraseCounts(phrase: Seq[String]): Seq[(Long, Long)] = {
    val docs = docsOf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    docs.flatMap { case (id, text) =>
      val toks = tokens(text)
      val n = toks.sliding(phrase.size).count(_ == phrase)
      if (n >= 1) Some((id, n.toLong)) else None
    }.sortBy(_._1)
  }

  test("phrase search equals a brute-force sliding-window scan") {
    val expected = phraseCounts(InvertedIndex.PhraseTerms)
    val got = InvertedIndex.searchPhrase(spark, docsOf, sf001)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected)
    assert(got.nonEmpty, "fixture phrase found nowhere")
  }

  test("phrase search handles duplicate phrase terms (overlapping matches)") {
    val phrase = Seq("batch", "batch", "batch")
    val expected = phraseCounts(phrase)
    val got = InvertedIndex.searchPhrase(spark, docsOf, sf001, phrase)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected)
    assert(got.nonEmpty, "no batch-batch-batch run in the sf0.001 fixture")
    // a run of L repeats contains L-2 overlapping trigram starts: the
    // counter must see overlaps, not disjoint chunks
    assert(expected.exists(_._2 >= 1))
  }

  test("incremental search: saved base + delta-only postings equals the full-corpus search") {
    val full = InvertedIndex.searchAnd(spark, docsOf, sf001)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val q = InvertedIndex.searchAndIncremental(spark, docsOf, sf001)
    val got = q.orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == full.toSeq)
    // matches exist on BOTH sides of the split (the merge is non-vacuous)
    assert(got.exists(_._1 % InvertedIndex.DeltaMod == 0) &&
      got.exists(_._1 % InvertedIndex.DeltaMod != 0))
    // the base corpus is never re-tokenized: exactly one documents scan
    // (the delta side) in the executed plan; the base side reads the
    // artifact
    q.collect()
    val scans = allPlanNodes(q.queryExecution.executedPlan).collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    val docScans = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("documents.parquet")))
    val idxScans = scans.filter(
      _.relation.location.rootPaths.exists(_.toString.contains("graft_invidx")))
    assert(docScans.size == 1, s"base re-tokenized: ${docScans.size} documents scans")
    assert(idxScans.nonEmpty, "saved base index never read")
  }

  test("absent query terms: conjunctive search is empty, ranked search ignores them") {
    val got = InvertedIndex.searchAnd(spark, docsOf, sf001,
      Seq("dup", "zzznotaterm")).collect()
    assert(got.isEmpty, "conjunction with an absent term must match nothing")
    // ranked OR search still returns the present term's docs
    val ranked = InvertedIndex.searchRanked(spark, docsOf, sf001,
      Seq("dup", "zzznotaterm")).collect()
    assert(ranked.nonEmpty)
  }

  test("single-term phrase degenerates to occurrence counts") {
    val docs = docsOf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val expected = docs.flatMap { case (id, t) =>
      val n = tokens(t).count(_ == "dup")
      if (n >= 1) Some((id, n.toLong)) else None
    }.sortBy(_._1)
    val got = InvertedIndex.searchPhrase(spark, docsOf, sf001, Seq("dup"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected.toSeq)
  }

  test("proximity search equals a brute-force windowed scan") {
    val docs = docsOf.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val (t1, t2) = InvertedIndex.NearTerms
    val slop = InvertedIndex.NearSlop
    val expected = docs.flatMap { case (id, text) =>
      val w = tokens(text).toIndexedSeq
      val anchors = w.zipWithIndex.count { case (tok, i) =>
        tok == t1 && (i + 1 to math.min(i + slop, w.length - 1))
          .exists(j => w(j) == t2)
      }
      if (anchors >= 1) Some((id, anchors.toLong)) else None
    }.sortBy(_._1)
    val got = InvertedIndex.searchNear(spark, docsOf, sf001)
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSeq == expected.toSeq)
    assert(got.nonEmpty)
  }

  test("facets roll up exactly from the conjunctive hit set") {
    val hits = InvertedIndex.searchAnd(spark, docsOf, sf001).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    val srcOf = docsOf.select("doc_id", "source").collect()
      .map(r => (r.getLong(0), r.getString(1))).toMap
    val expected = hits.toSeq.groupBy { case (id, _) => srcOf(id) }
      .map { case (s, xs) => (s, xs.size.toLong, xs.map(_._2).sum) }
      .toSeq.sortBy(_._1)
    val got = InvertedIndex.searchFacets(spark, docsOf, sf001)
      .orderBy("source").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.toSeq == expected)
  }

  test("bucket stats roll up exactly from the postings frame") {
    val direct = InvertedIndex.postings(docsOf)
      .groupBy("b", "term").agg(count(lit(1)).as("df"), sum("tf").as("tft"))
      .groupBy("b").agg(
        count(lit(1)).as("n_terms"),
        sum("df").as("n_postings"),
        sum("tft").as("tf_total"))
      .orderBy("b").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val viaIndex = InvertedIndex.bucketStats(spark, docsOf, sf001)
      .orderBy("b").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(viaIndex.toSeq == direct.toSeq)
    // postings conserve the corpus token count (empty tokens excluded)
    val tokenMass = viaIndex.map(_._4).sum
    val directMass = docsOf.select(col("text")).collect()
      .map(r => tokens(r.getString(0)).size.toLong).sum
    assert(tokenMass == directMass)
  }
}
