package graft.similarity

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbour — the coarse-
  * quantizer half of Jégou/Douze/Schmid's IVF-PQ ("Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011) — the second scale path next
  * to sign-LSH ([[SimilaritySearch.topKAnn]]).
  *
  * Index build: k-means centroids (MLlib, fixed seed) partition the corpus
  * into `nlist` inverted lists; each vector is assigned to its nearest
  * centroid. Search: a query probes its `nprobe` nearest centroids and
  * ranks only those lists' vectors by exact quantized cosine.
  *
  * Scale shape: the assignment is one scan + a broadcast of `nlist`
  * centroids; search shuffles nothing new — the candidate join is a
  * broadcast equi-join on the list id (queries and their probe lists are
  * driver-side metadata, exactly like a partition-pruning predicate). At
  * 100 TB: centroids come from `fit` on a SAMPLE (the sampling layer again),
  * the lists are the physical partitioning, and probing is partition
  * pruning. No oracle SQL — k-means is not replayable in DuckDB; correctness
  * is pinned by recall/consistency specs against the brute-force baseline.
  */
object IvfIndex {

  val NList = 16
  val NProbe = 4

  /** Candidate top-k via IVF probing. Deterministic for a fixed seed. */
  def topK(
      spark: SparkSession,
      embeddings: DataFrame,
      numQueries: Int = SimilaritySearch.NumQueries,
      k: Int = SimilaritySearch.TopK,
      nlist: Int = NList,
      nprobe: Int = NProbe,
      seed: Long = 42L): DataFrame = {
    import spark.implicits._

    val vecs = graft.queries.Tables.parallelismFloor(embeddings)
      .select(col("vec_id"), array_to_vector(col("embedding")).as("features"))
    // Centroids are trained on a seeded Bernoulli SAMPLE of the corpus (the
    // engine's own sampling layer): k-means quality needs only enough points
    // per centroid, not the full 100 TB — fitting on everything would make
    // index BUILD as expensive as a full scan × iterations. `trainFraction`
    // keeps ≥ ~100·nlist expected points here and would shrink toward 1e-4
    // at corpus scale; ASSIGNMENT still covers every vector below.
    val trainFraction = 0.5
    val train = graft.sampling.Sampled(vecs, trainFraction, seed).data
    val model = new KMeans()
      .setK(nlist).setSeed(seed).setMaxIter(10)
      .setFeaturesCol("features").setPredictionCol("list")
      .fit(train)
    val assigned = model.transform(vecs).select(col("vec_id"), col("list"))

    // probe table: per query, its nprobe nearest centroids (driver-side —
    // numQueries × nlist distances is metadata, like partition pruning)
    val centers = model.clusterCenters.map(_.toArray)
    val queryVecs = embeddings
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id"), col("embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1).map(_.toDouble).toArray)
    val probes = queryVecs.flatMap { case (qid, qv) =>
      centers.zipWithIndex
        .map { case (c, i) =>
          val d = qv.zip(c).map { case (a, b) => (a - b) * (a - b) }.sum
          (i, d)
        }
        .sortBy(_._2)
        .take(nprobe)
        .map { case (list, _) => (qid, list) }
    }.toSeq.toDF("query_id", "list")

    val prep = SimilaritySearch.prepared(embeddings)
    val queries = prep
      .filter(col("vec_id") < numQueries)
      .select(col("vec_id").as("query_id"), col("qv").as("q_qv"), col("nrm").as("q_nrm"))
    val cands = assigned
      .join(broadcast(probes), Seq("list"))
      .join(prep, Seq("vec_id"))
      .join(broadcast(queries), Seq("query_id"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(
        col("query_id"),
        col("vec_id").as("neighbor_id"),
        (SimilaritySearch.dotQ(col("q_qv"), col("qv")).cast("double") /
          (col("q_nrm") * col("nrm"))).as("sim"))
    val w = Window.partitionBy("query_id").orderBy(col("sim").desc, col("neighbor_id"))
    cands.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select("query_id", "neighbor_id", "sim")
  }
}
