package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** [[CosinePairs]] against a plain-Scala brute-force recomputation (no
  * prefix filter, no fixed-point shortcuts beyond the shared convention),
  * plus the losslessness and plan-shape claims its scale argument rests
  * on.
  */
class CosinePairsSpec extends SparkSpec {

  private lazy val corpus = DedupCorpus.augment(Tables.documents(spark, sf001))

  /** Brute force: shingle tf vectors, derived df cut, capped integer
    * weights, exact all-pairs cosine — independent of every Spark-side
    * construct.
    */
  private def bruteForceFor(docs: Seq[(Long, String)]): Map[(Long, Long), Double] = {
    def shingles(text: String): Seq[String] = {
      val w = text.toLowerCase.split("[^a-z0-9]+", -1)
      if (w.length < CosinePairs.ShingleK) Seq.empty
      else w.sliding(CosinePairs.ShingleK).map(_.mkString(" ")).toSeq
    }
    val tf: Map[Long, Map[String, Long]] = docs.map { case (id, text) =>
      id -> shingles(text).groupBy(identity).view.mapValues(_.size.toLong).toMap
    }.toMap
    val df: Map[String, Long] = tf.values.flatMap(_.keys).groupBy(identity)
      .view.mapValues(_.size.toLong).toMap
    val maxDf = CosinePairs.maxDfFor(docs.length.toLong)
    val vecs: Map[Long, Map[String, Long]] = tf.view.mapValues(_.collect {
      case (s, c) if df(s) <= maxDf =>
        s -> math.min(c, CosinePairs.TfCap) * CosinePairs.WScale / df(s)
    }.toMap).toMap.filter(_._2.values.exists(_ > 0))
    val norms: Map[Long, Double] =
      vecs.view.mapValues(v => math.sqrt(v.values.map(w => (w * w).toDouble).sum)).toMap
    val withNorm = vecs.filter { case (id, v) => v.values.map(w => w * w).sum > 0 }
    (for {
      a <- withNorm.keys; b <- withNorm.keys if a < b
      dot = withNorm(a).keysIterator
        .filter(withNorm(b).contains)
        .map(s => withNorm(a)(s) * withNorm(b)(s)).sum
      cos = dot.toDouble / (norms(a) * norms(b))
      if cos >= CosinePairs.MinCosine
    } yield (a, b) -> cos).toMap
  }

  private lazy val bruteForce: Map[(Long, Long), Double] =
    bruteForceFor(corpus.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq)

  test("cosine pairs equal the brute-force all-pairs result exactly") {
    val got = CosinePairs.nearDupPairs(corpus).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got.keySet === bruteForce.keySet,
      s"missing=${(bruteForce.keySet -- got.keySet).take(5)} " +
        s"extra=${(got.keySet -- bruteForce.keySet).take(5)}")
    got.foreach { case (k, cos) => assert(cos === bruteForce(k)) }
    assert(got.nonEmpty) // the injected duplicates must surface
  }

  test("tf saturation: an over-cap repeat weighs as TfCap and its doc survives") {
    import spark.implicits._
    // doc 1/2: a shingle repeated ~1500× (above TfCap=1000) plus distinct
    // tails that overlap between the two — the cap changes the RELATIVE
    // weight of the repeat vs the tails, so a saturation mismatch between
    // engine and reference shifts the cosine, and an uncapped-weight
    // regression toward Int64 wraparound starts here
    val spam = Array.fill(1502)("spam").mkString(" ")
    val tail = (0 until 40).map(i => s"unique tail token t$i").mkString(" ")
    val docs = Seq(
      (1L, s"$spam $tail"),
      (2L, s"$spam $tail extra drift words here")) ++
      (3L to 12L).map(i => i -> s"filler document number $i about topic ${i % 3}")
    val got = CosinePairs.nearDupPairs(docs.toDF("doc_id", "text")).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val ref = bruteForceFor(docs)
    assert(ref.contains((1L, 2L)), "fixture must produce the over-cap pair")
    assert(got.keySet === ref.keySet)
    got.foreach { case (k, cos) => assert(cos === ref(k)) }
  }

  test("derived df cut: fraction of corpus with a floor") {
    import CosinePairs.{maxDfFor, MinDfCap}
    assert(maxDfFor(0) === MinDfCap)
    assert(maxDfFor(80) === MinDfCap) // 20% of 80 = 16 = floor
    assert(maxDfFor(100) === 20L)
    assert(maxDfFor(5000) === 1000L) // scales with the corpus
    val vals = (1L to 20L).map(i => maxDfFor(i * 1000))
    assert(vals === vals.sorted)
  }

  test("sorted_intersect_dot equals a map-based reference on the live vectors") {
    import graft.functions.SortedIntersectDot.sortedIntersectDot
    val tf = Hashing.explodeShingles(corpus, CosinePairs.ShingleK)
      .select(col("doc_id"), Hashing.hash60(col("shingle")).as("g"))
      .groupBy("doc_id", "g").agg(count(lit(1)).as("w"))
    val arr = tf.groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("g"), col("w")))).as("gw"))
      .select(col("doc_id"),
        expr("transform(gw, x -> x.g)").as("gs"),
        expr("transform(gw, x -> x.w)").as("ws"))
      .limit(50).localCheckpoint(false)
    val pairs = arr.as("a").crossJoin(arr.as("b"))
      .filter(col("a.doc_id") < col("b.doc_id"))
      .select(
        sortedIntersectDot(col("a.gs"), col("a.ws"), col("b.gs"), col("b.ws")).as("dot"),
        col("a.gs").as("ga"), col("a.ws").as("wa"),
        col("b.gs").as("gb"), col("b.ws").as("wb"))
      .collect()
    assert(pairs.nonEmpty)
    pairs.foreach { r =>
      val a = r.getSeq[Long](1).zip(r.getSeq[Long](2)).toMap
      val b = r.getSeq[Long](3).zip(r.getSeq[Long](4)).toMap
      val ref = a.keysIterator.filter(b.contains).map(g => a(g) * b(g)).sum
      assert(r.getLong(0) === ref)
    }
  }

  test("candidate generation is an equi-join — no cartesian anywhere") {
    val plan = CosinePairs.nearDupPairs(corpus).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
