package graft.multimodal

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ImageDedupSpec extends SparkSpec {

  private val nGroups = 40
  private lazy val assets = ImageDedup.synthesizeVariants(spark, nGroups)
  private lazy val hashed = ImageDedup.hashes(spark, assets)

  test("aHash: deterministic, identical images hash identically, " +
    "perturbed variants stay within a small Hamming distance") {
    val base = ImageDedup.pngVariant(24, 20, 7L, 0)
    assert(ImageDedup.aHash(base) === ImageDedup.aHash(ImageDedup.pngVariant(24, 20, 7L, 0)))
    val v3 = ImageDedup.aHash(ImageDedup.pngVariant(24, 20, 7L, 3))
    val d = java.lang.Long.bitCount(ImageDedup.aHash(base) ^ v3)
    // 3 perturbed pixels touch ≤3 cells directly; the shifted global mean
    // can flip a few borderline cells on top
    assert(d <= 16, s"variant-3 hamming $d")
  }

  test("banded pairs == brute-force all-pairs at the pigeonhole-exact threshold") {
    val hs = hashed.collect().map(r => (r.getLong(0), r.getLong(1)))
    val brute = (for {
      (ia, ha) <- hs
      (ib, hb) <- hs
      if ia < ib
      d = java.lang.Long.bitCount(ha ^ hb)
      if d <= ImageDedup.MaxHamming
    } yield (ia, ib, d.toLong)).toSet
    val banded = ImageDedup.nearDupPairs(hashed).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(banded === brute)
    assert(banded.nonEmpty)
  }

  test("within-group recall: most duplicate groups surface at least one pair, " +
    "cross-group false positives are absent") {
    val pairs = ImageDedup.nearDupPairs(hashed).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    // random 64-bit hashes of unrelated images sit ~32 bits apart — a ≤7
    // pair across groups would be an aHash collision, not expected at n=200
    assert(pairs.forall { case (a, b) =>
      a / ImageDedup.GroupSize == b / ImageDedup.GroupSize
    })
    val groupsHit = pairs.map(_._1 / ImageDedup.GroupSize).distinct.length
    assert(groupsHit >= nGroups / 2, s"only $groupsHit/$nGroups groups produced a pair")
  }

  test("saved-artifact path: pairs from the published hash parquet equal " +
    "the direct decode path, and the artifact lands at the declared location") {
    val direct = ImageDedup.nearDupPairs(
      ImageDedup.hashes(spark, ImageDedup.synthesizeVariants(spark, 20)))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val path = ImageDedup.ensureSavedHashes(spark, 20)
    assert(path === ImageDedup.savedHashesPath(20))
    assert(new java.io.File(s"$path/_SUCCESS").exists())
    val saved = ImageDedup.nearDupPairsSaved(spark, 20)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(saved === direct)
    assert(saved.nonEmpty)
  }
}
