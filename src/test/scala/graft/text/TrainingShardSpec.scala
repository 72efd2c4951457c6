package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables
import graft.sampling.MixtureResample

class TrainingShardSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Tables.documents(spark, sf001)

  test("manifest rows come only from curated, deduped documents; dropped " +
    "sources are absent; replica counts match the mixture weights") {
    val out = TrainingShard.manifest(docs).cache()
    try {
      // stage-1 containment: every manifest doc passed the rule chain
      val keptIds = CurationPipeline.verdicts(docs)
        .filter(col("keep")).select("doc_id").as[Long].collect().toSet
      val outIds = out.select("doc_id").distinct().as[Long].collect().toSet
      assert(outIds.nonEmpty && outIds.subsetOf(keptIds))
      // stage-3 drop: the zero-weight source never appears
      assert(out.filter(col("source") === "src2").count() === 0)
      // stage-2: one surviving doc per distinct text among the survivors
      val texts = docs.filter(col("doc_id").isin(outIds.toSeq: _*))
        .select("text").as[String].collect()
      assert(texts.length === texts.distinct.length)
      // stage-3 replica counts: each doc's copies = the mixture's copy
      // count for its source (recomputed independently per doc)
      val bySrc = out.groupBy("doc_id", "source").count()
        .as[(Long, String, Long)].collect()
      def h60(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
      }
      bySrc.foreach { case (id, src, n) =>
        val w = MixtureResample.DefaultWeightsBp.getOrElse(src, MixtureResample.DefaultBp)
        val frac = if (h60(s"m:$id") % MixtureResample.Mod < w % MixtureResample.Mod) 1 else 0
        assert(n === w / MixtureResample.Mod + frac, s"doc $id source $src")
      }
    } finally out.unpersist()
  }

  test("near-dup variant: survivors are exactly the quality-keep canonical " +
    "set of the curated augmented corpus, and fuzzy dedup actually bites") {
    import graft.dedup.{DedupClusters, DedupCorpus}
    val out = TrainingShard.manifestNearDup(docs).cache()
    try {
      // recompose stages 1-2 independently: curation keep-set over the
      // source-carrying augmented corpus, then the canonical winners
      val corpus = DedupCorpus.augmentWithSource(docs)
      val keptIds = CurationPipeline.verdicts(corpus)
        .filter(col("keep")).select("doc_id").as[Long].collect().toSet
      val curated = corpus.filter(col("doc_id").isin(keptIds.toSeq: _*))
      val canon = DedupClusters
        .canonicalByQuality(curated.select(col("doc_id"), col("text")))
        .select("canonical_id").as[Long].collect().toSet
      val outIds = out.select("doc_id").distinct().as[Long].collect().toSet
      assert(outIds.nonEmpty)
      // manifest docs = canonical winners with a POSITIVE mixture copy
      // count (zero-weight sources drop entirely; down-weighted sources
      // drop the docs whose position hash falls outside the keep range) —
      // the copy rule recomputed independently, as in the manifest spec
      def h60(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
      }
      val srcOf = curated.select("doc_id", "source")
        .as[(Long, String)].collect().toMap
      val expected = canon.filter { id =>
        val w = MixtureResample.DefaultWeightsBp
          .getOrElse(srcOf(id), MixtureResample.DefaultBp)
        val frac = if (h60(s"m:$id") % MixtureResample.Mod < w % MixtureResample.Mod) 1 else 0
        w / MixtureResample.Mod + frac > 0
      }
      assert(outIds === expected)
      // the fuzzy stage removed at least the injected exact copies that
      // survived curation: strictly fewer survivors than curated docs
      assert(canon.size < keptIds.size)
      // every synthetic exact copy lost to its original (identical text →
      // equal quality → min-id tie-break keeps the original)
      val exactCopies = outIds.filter(id =>
        id >= DedupCorpus.ExactDupOffset && id < DedupCorpus.NearDupOffset)
      assert(exactCopies.isEmpty, s"exact copies survived: $exactCopies")
    } finally { out.unpersist(); spark.catalog.clearCache() }
  }

  test("substring variant: survivors are the quality-keep canonical set of " +
    "the substring-cleaned curated corpus, and excision bites before packing") {
    import graft.dedup.{DedupClusters, DedupCorpus, SubstringDedup}
    val out = TrainingShard.manifestSubstring(docs).cache()
    try {
      // recompose stages 1-3 independently: curation keep-set, substring
      // excision (empty survivors drop), then the canonical winners over
      // the CLEANED text
      val corpus = DedupCorpus.augmentWithSource(docs)
      val keptIds = CurationPipeline.verdicts(corpus)
        .filter(col("keep")).select("doc_id").as[Long].collect().toSet
      val curated = corpus.filter(col("doc_id").isin(keptIds.toSeq: _*))
      val cleaned = SubstringDedup.cleaned(curated.select(col("doc_id"), col("text")))
        .filter(length(col("text_clean")) > 0)
      val cleanedCorpus = curated.select(col("doc_id"), col("source"))
        .join(cleaned, "doc_id")
        .select(col("doc_id"), col("text_clean").as("text"), col("source"))
      val canon = DedupClusters
        .canonicalByQuality(cleanedCorpus.select(col("doc_id"), col("text")))
        .select("canonical_id").as[Long].collect().toSet
      val outIds = out.select("doc_id").distinct().as[Long].collect().toSet
      assert(outIds.nonEmpty)
      def h60(s: String): Long = {
        val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
        java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
      }
      val srcOf = cleanedCorpus.select("doc_id", "source")
        .as[(Long, String)].collect().toMap
      val expected = canon.filter { id =>
        val w = MixtureResample.DefaultWeightsBp
          .getOrElse(srcOf(id), MixtureResample.DefaultBp)
        val frac = if (h60(s"m:$id") % MixtureResample.Mod < w % MixtureResample.Mod) 1 else 0
        w / MixtureResample.Mod + frac > 0
      }
      assert(outIds === expected)
      // every injected exact copy excised to EMPTY (its keeper carries the
      // text verbatim) and left the chain before the near-dup stage even
      // saw it — the substring stage subsumes exact dedup
      val exactCopies = outIds.filter(id =>
        id >= DedupCorpus.ExactDupOffset && id < DedupCorpus.NearDupOffset)
      assert(exactCopies.isEmpty, s"exact copies survived excision: $exactCopies")
      // excision bites the token budget: per surviving doc the packed tok
      // never exceeds the UNCLEANED count (cutting characters cannot add
      // whitespace tokens), and the corpus-wide total strictly shrinks
      // (the injected near copies share >= 40-char spans with their bases)
      val perDoc = out.select("doc_id", "tok").distinct()
        .join(
          curated.select(col("doc_id"),
            graft.sampling.TokenBudget.tokOfText.as("tok_orig")),
          "doc_id")
      assert(perDoc.filter(col("tok") > col("tok_orig")).isEmpty)
      val Row2 = perDoc.agg(sum(col("tok")), sum(col("tok_orig"))).collect().head
      assert(Row2.getLong(0) < Row2.getLong(1),
        s"excision removed no tokens: clean=${Row2.getLong(0)} orig=${Row2.getLong(1)}")
    } finally { out.unpersist(); spark.catalog.clearCache() }
  }

  test("sampled twin: summary equals the HT-scaled aggregate of the chain " +
    "run on the sampled slice, and estimates land near the full-run truth") {
    val pct = 10
    val scaleN = graft.sampling.UniverseSampled.RangeMod / pct
    val sample = graft.sampling.UniverseSampled.sample(docs, col("doc_id"), pct)
    val full = TrainingShard.manifest(sample)
      .select("doc_id", "tok").as[(Long, Long)].collect()
    val row = TrainingShard.manifestSampled(docs, pct).collect().head
    assert(row.getAs[Long]("sample_docs") === full.map(_._1).distinct.length.toLong)
    assert(row.getAs[Long]("sample_replicas") === full.length.toLong)
    assert(row.getAs[Long]("sample_tokens") === full.map(_._2).sum)
    assert(row.getAs[Long]("est_kept_docs") === row.getAs[Long]("sample_docs") * scaleN)
    assert(row.getAs[Long]("est_tokens") === row.getAs[Long]("sample_tokens") * scaleN)
    assert(row.getAs[Long]("est_packs") ===
      (row.getAs[Long]("est_tokens") + SequencePacking.PackTokens - 1) /
        SequencePacking.PackTokens)
    // the estimate is an estimate OF something: within 50 % of the full
    // pipeline's true totals at sf0.001 (a loose bound — the sample holds
    // ~10 % of docs; tighter bounds belong to RatioLadderSpec's T4 math)
    val truth = TrainingShard.manifest(docs)
      .agg(sum(col("tok"))).as[Long].collect().head
    val est = row.getAs[Long]("est_tokens")
    assert(est > truth / 2 && est < truth * 2,
      s"est_tokens $est vs true total $truth")
  }

  test("cum is a global prefix sum over the manifest and packs hug the budget") {
    val rows = TrainingShard.manifest(docs)
      .select("tok", "cum", "pack_id")
      .as[(Long, Long, Long)].collect()
    // sorted by cum, each row's cum = previous cum + tok (a permutation
    // prefix sum with no gaps or overlaps)
    val sorted = rows.sortBy(_._2)
    sorted.zip(sorted.scanLeft(0L)(_ + _._1).init).foreach { case ((tok, cum, _), prev) =>
      assert(cum === prev + tok)
    }
    // pack assignment is the chunk of the doc's first token
    rows.foreach { case (tok, cum, pack) =>
      assert(pack === (cum - tok) / SequencePacking.PackTokens)
    }
  }
}
