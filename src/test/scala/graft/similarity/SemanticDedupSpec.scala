package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class SemanticDedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Tables.embeddings(spark, sf001)

  test("decisions agree with a brute-force scala reimplementation") {
    val vecs = emb.select(col("vec_id"), col("embedding"))
      .as[(Long, Seq[Float])].collect()
    // the operator derives its width from the raw corpus count (r14)
    val np = PlaneBudget.bandBits(vecs.length.toLong)
    val signs = SimilaritySearch.signsFor(np)
    val prep = vecs.map { case (id, e) =>
      val qv = e.map(x => math.round(x.toDouble * SimilaritySearch.Scale)).toArray
      val nrm = math.sqrt(qv.map(x => x * x).sum.toDouble)
      val bucket = (0 until np).map { p =>
        val d = qv.indices.map(i => qv(i) * signs(p)(i)).sum
        if (d > 0) 1L << p else 0L
      }.sum
      (id, qv, nrm, bucket)
    }.filter(_._3 > 0)
    val repOf = prep.groupBy(_._4).map { case (b, rows) =>
      b -> rows.minBy(_._1)
    }
    val expect = prep.map { case (id, qv, nrm, bucket) =>
      val (repId, repQv, repNrm, _) = repOf(bucket)
      val sim = qv.indices.map(i => qv(i) * repQv(i)).sum.toDouble / (nrm * repNrm)
      (id, bucket, repId, sim, id == repId || sim < SemanticDedup.MinSim)
    }.sortBy(_._1).toSeq
    val got = SemanticDedup.decisions(emb)
      .orderBy("vec_id").as[(Long, Long, Long, Double, Boolean)].collect().toSeq
    assert(got.map(r => (r._1, r._2, r._3, r._5)) ===
      expect.map(r => (r._1, r._2, r._3, r._5)))
    got.zip(expect).foreach { case (g, e) => assert(math.abs(g._4 - e._4) < 1e-12) }
  }

  test("every vector gets exactly one decision; representatives are always kept") {
    val d = SemanticDedup.decisions(emb).cache()
    try {
      assert(d.count() === d.select("vec_id").distinct().count())
      assert(d.filter(col("vec_id") === col("rep_id") && !col("keep")).count() === 0)
      // the threshold actually bites on this corpus (non-vacuity), and
      // something also survives beyond the representatives
      assert(d.filter(!col("keep")).count() > 0)
      assert(d.filter(col("keep") && col("vec_id") =!= col("rep_id")).count() > 0)
      // rep_id is the bucket minimum
      assert(d.filter(col("rep_id") > col("vec_id")).count() === 0)
    } finally d.unpersist()
  }

  test("zero-norm vectors get an explicit keep decision, not silent omission") {
    import spark.implicits._
    // one degenerate all-zero embedding among real ones: a consumer that
    // keeps via keep=true must not silently delete it (review finding —
    // the row was previously absent from the output)
    val rows = (0L until 20L).map(i =>
      (i, Array.fill(64)(if (i == 7L) 0.0f else (0.1f + (i % 5) * 0.01f))))
    val emb = rows.toDF("vec_id", "embedding")
    val d = SemanticDedup.decisions(emb).collect()
    assert(d.length === 20, "every vector must have exactly one decision row")
    val zero = d.find(_.getLong(0) == 7L).get
    assert(zero.getAs[Boolean]("keep"))
    assert(zero.isNullAt(zero.fieldIndex("sim")), "no angle exists for a zero vector")
    assert(zero.getLong(zero.fieldIndex("rep_id")) === 7L)
  }
}
