package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** [[EmbeddingCentroids]] against a brute-force quantize-and-sum, and the
  * bounded-state property (|labels|·dims output rows).
  */
class EmbeddingCentroidsSpec extends SparkSpec {

  test("centroid sums equal a brute-force per-label accumulation") {
    val rows = Tables.embeddings(spark, sf001)
      .select(col("label"), col("embedding"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val dims = rows.head._2.length
    val expected = rows.groupBy(_._1).toSeq.sortBy(_._1).flatMap { case (label, vs) =>
      (0 until dims).map { d =>
        val qs = vs.map(v => math.round(v._2(d).toDouble * SimilaritySearch.Scale))
        (label, d.toLong, qs.sum, vs.size.toLong)
      }
    }
    val got = EmbeddingCentroids.centroids(Tables.embeddings(spark, sf001))
      .orderBy("label", "dim").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.length == expected.length) // |labels| · dims, nothing more
    assert(got.toSeq == expected)
  }
}
