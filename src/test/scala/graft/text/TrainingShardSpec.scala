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
