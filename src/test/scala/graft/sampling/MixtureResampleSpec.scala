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
}
