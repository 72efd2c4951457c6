package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class MixtureResampleSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Tables.documents(spark, sf001)

  /** The same salted 60-bit hash, recomputed independently of Spark. */
  private def hash60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  test("resample agrees with a brute-force scala reimplementation") {
    val in = docs.select("doc_id", "source").as[(Long, String)].collect()
    val w = MixtureResample.DefaultWeightsBp
    val expect = in.flatMap { case (id, src) =>
      val bp = w.getOrElse(src, MixtureResample.DefaultBp)
      val frac = if (hash60(s"m:$id") % MixtureResample.Mod < bp % MixtureResample.Mod) 1 else 0
      (0L until (bp / MixtureResample.Mod + frac)).map(c => (id, src, c))
    }.sortBy(r => (r._1, r._3)).toSeq
    val got = MixtureResample.resample(docs)
      .orderBy("doc_id", "copy").as[(Long, String, Long)].collect().toSeq
    assert(got === expect)
  }

  test("weight semantics: zero drops, whole part replicates, fraction is unbiased-ish") {
    val out = MixtureResample.resample(docs).cache()
    try {
      // weight 0 → src2 absent entirely
      assert(out.filter(col("source") === "src2").count() === 0)
      // weight 2.5 → every src0 doc appears at least twice (copies 0 and 1)
      val src0In = docs.filter(col("source") === "src0").count()
      val src0PerDoc = out.filter(col("source") === "src0")
        .groupBy("doc_id").count().select("count").as[Long].collect()
      assert(src0PerDoc.length === src0In)
      assert(src0PerDoc.forall(c => c == 2L || c == 3L))
      // weight 0.3 → src1 docs appear at most once, and fewer than input
      val src1In = docs.filter(col("source") === "src1").count()
      val src1Out = out.filter(col("source") === "src1").count()
      assert(src1Out < src1In)
      assert(out.filter(col("source") === "src1")
        .groupBy("doc_id").count().filter(col("count") > 1).count() === 0)
      // default weight 1.0 → other sources pass through exactly once
      val others = out.filter(!col("source").isin("src0", "src1", "src2"))
      assert(others.count() ===
        docs.filter(!col("source").isin("src0", "src1", "src2")).count())
    } finally out.unpersist()
  }

  test("determinism: re-running over a repartitioned input yields the identical manifest") {
    val a = MixtureResample.resample(docs).orderBy("doc_id", "copy").collect()
    val b = MixtureResample.resample(docs.repartition(7)).orderBy("doc_id", "copy").collect()
    assert(a.toSeq === b.toSeq)
  }

  test("temperature weights: flatten toward rare sources, match brute-force math") {
    val counts = docs.groupBy("source").count().as[(String, Long)].collect().toMap
    val nTot = counts.values.sum
    val sq = counts.view.mapValues(n => math.floor(math.sqrt(n.toDouble)).toLong).toMap
    val sTot = sq.values.sum
    val expect = counts.map { case (s, n) => s -> (nTot * sq(s) * 10000L) / (sTot * n) }
    val got = MixtureResample.temperatureWeights(docs)
      .select("source", "w_bp").as[(String, Long)].collect().toMap
    assert(got === expect)
    // α = 1/2 flattening: the rarest source gets the largest weight, the
    // most common the smallest
    val rare = counts.minBy(_._2)._1
    val bulk = counts.maxBy(_._2)._1
    if (counts(rare) < counts(bulk))
      assert(got(rare) >= got(bulk),
        s"rare $rare (${got(rare)}bp) not up-weighted vs $bulk (${got(bulk)}bp)")
  }

  test("temperature manifest: expected size ≈ corpus size, deterministic") {
    val out = MixtureResample.resampleTemperature(docs)
    val n = out.count()
    val in = docs.count()
    // Σ w_s·n_s ≈ n_tot by normalization; hash-fraction noise + integer
    // quantization keep it within a few percent at 500 docs
    assert(math.abs(n - in).toDouble / in < 0.1, s"manifest $n vs corpus $in")
    val b = MixtureResample.resampleTemperature(docs.repartition(5)).collect()
    assert(out.collect().toSeq === b.toSeq)
  }
}
