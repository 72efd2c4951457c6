package graft.similarity

import org.scalatest.funsuite.AnyFunSuite

/** Pins the in-plan LSH sizing contract (VERDICT r13 item 1): the derived
  * band width keeps expected bucket occupancy at or below TargetBucket at
  * ANY corpus size, minimally (one fewer bit would overflow the target),
  * monotonically, and within the [MinBits, MaxBits] clamp. The
  * DuckDB-replay equivalence of [[PlaneBudget.bandBitsSql]] /
  * [[PlaneBudget.dynamicBandsSql]] is gated by Verify's hash-match on
  * `simsearch_knn_graph` / `dedup_embedding_pairs_banded` (no DuckDB in
  * this JVM).
  */
class PlaneBudgetSpec extends AnyFunSuite {

  test("bandBits holds occupancy <= TargetBucket, minimally, across sizes") {
    val samples = Seq(0L, 1L, 255L, 256L, 257L, 500L, 2000L, 16000L,
      1000000L, 67108864L, Long.MaxValue / 4)
    for (n <- samples) {
      val b = PlaneBudget.bandBits(n)
      assert(b >= PlaneBudget.MinBits && b <= PlaneBudget.MaxBits)
      if (b < PlaneBudget.MaxBits)
        assert((1L << b) * PlaneBudget.TargetBucket >= n,
          s"occupancy overflows target at n=$n, b=$b")
      if (b > PlaneBudget.MinBits)
        assert((1L << (b - 1)) * PlaneBudget.TargetBucket < n,
          s"width not minimal at n=$n, b=$b")
    }
  }

  test("fixture-relevant values and the x32 growth the scale probe rides on") {
    assert(PlaneBudget.bandBits(500L) === 3)   // sf0.001/sf0.01 embeddings
    assert(PlaneBudget.bandBits(2000L) === 5)  // sf0.1 embeddings
    // x32 population (the probe's top factor): +5 bits, bucket size constant
    assert(PlaneBudget.bandBits(500L * 32) === PlaneBudget.bandBits(500L) + 5)
  }

  test("bandBits is monotone nondecreasing and clamped") {
    val pts = Seq(0L, 10L, 100L, 1000L, 10000L, 100000L, 10000000L, Long.MaxValue / 2)
    val bs = pts.map(PlaneBudget.bandBits)
    assert(bs === bs.sorted)
    assert(PlaneBudget.bandBits(0L) === PlaneBudget.MinBits)
    assert(PlaneBudget.bandBits(Long.MaxValue / 2) === PlaneBudget.MaxBits)
  }
}
