package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class KnnGraphSpec extends SparkSpec {

  private lazy val emb = Tables.embeddings(spark, sf001)

  test("graph: ≤ k neighbors per query, ranked by sim desc with id ties") {
    val out = KnnGraph.graph(emb, k = 3).collect()
    assert(out.nonEmpty)
    val byQ = out.groupBy(_.getLong(0))
    byQ.foreach { case (q, rows) =>
      assert(rows.length <= 3, s"query $q has ${rows.length} > k neighbors")
      val sims = rows.sortBy(_.getLong(3)).map(_.getDouble(2))
      assert(sims.sameElements(sims.sortBy(-(_: Double))), s"query $q ranks out of order")
      assert(!rows.exists(_.getLong(1) == q), s"query $q is its own neighbor")
    }
  }

  test("graph neighbors are a subset of brute-force candidates, sims exact") {
    // brute-force all-pairs sims on the tiny corpus (driver-side, test only)
    val prep = SimilaritySearch.prepared(emb)
      .select("vec_id", "qv", "nrm").collect()
      .map(r => (r.getLong(0), r.getSeq[Long](1).toArray, r.getDouble(2)))
    def sim(a: Array[Long], b: Array[Long], na: Double, nb: Double): Double =
      a.zip(b).map { case (x, y) => x * y }.sum / (na * nb)
    val exact = (for {
      (ia, va, na) <- prep; (ib, vb, nb) <- prep if ia != ib
    } yield (ia, ib) -> sim(va, vb, na, nb)).toMap
    KnnGraph.graph(emb).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      assert(math.abs(r.getDouble(2) - exact(key)) == 0.0,
        s"sim mismatch for $key")
    }
  }

  test("hard negatives: exactly one per query, label differs, sim is max cross-label in-bucket") {
    val out = KnnGraph.hardNegatives(emb).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length === out.length, "duplicate query rows")
    out.foreach { r =>
      assert(r.getLong(1) !== r.getLong(3), s"query ${r.getLong(0)}: negative shares its label")
    }
  }

  test("classify: one prediction per covered query; votes bounded by k") {
    val out = KnnGraph.classify(emb).collect()
    assert(out.nonEmpty)
    assert(out.map(_.getLong(0)).distinct.length === out.length)
    assert(out.forall(r => r.getLong(3) >= 1 && r.getLong(3) <= KnnGraph.K))
    // self-consistency: the prediction is the majority label of the
    // ranked graph's neighbors (ties to the smaller label), recomputed
    // driver-side from graph() + the label table. (The synthetic labels
    // are geometry-independent — brute-force 5-NN accuracy is chance —
    // so label-recovery accuracy is NOT a meaningful assertion here.)
    val labels = emb.select("vec_id", "label").collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    val expected = KnnGraph.graph(emb).collect()
      .groupBy(_.getLong(0))
      .map { case (q, rows) =>
        val votes = rows.groupBy(r => labels(r.getLong(1)))
          .view.mapValues(_.length.toLong).toMap
        q -> votes.toSeq.minBy { case (l, v) => (-v, l) }
      }
    out.foreach { r =>
      val (pl, pv) = expected(r.getLong(0))
      assert(r.getLong(2) === pl && r.getLong(3) === pv,
        s"query ${r.getLong(0)}: pred (${r.getLong(2)}, ${r.getLong(3)}) vs recomputed ($pl, $pv)")
    }
  }

  test("plan: candidates meet only in buckets — no cartesian") {
    val plan = KnnGraph.graph(emb).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
    // the per-query top-k runs a pre-shuffle partial rank
    assert(plan.contains("WindowGroupLimit"), s"no WindowGroupLimit:\n$plan")
  }
}
