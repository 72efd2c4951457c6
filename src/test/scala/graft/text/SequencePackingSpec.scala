package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.dedup.Hashing
import graft.queries.Tables
import graft.sampling.TokenBudget

/** [[SequencePacking]]: the distributed concat-and-chunk assignment must
  * equal a single-machine recomputation, and pack token totals must hug
  * the budget (each pack starts within one document of its boundary).
  */
class SequencePackingSpec extends SparkSpec {

  test("pack assignment equals brute force; pack sizes hug the budget") {
    val base = Tables.documents(spark, sf001)
      .select(
        col("doc_id"),
        Hashing.hash60(concat(lit("tb:"), col("doc_id").cast("string"))).as("h"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("tok"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val ordered = base.sortBy(t => (t._2 % TokenBudget.Buckets, t._2, t._1))
    val cums = ordered.scanLeft(0L)(_ + _._3).tail
    val L = SequencePacking.PackTokens
    val expected = ordered.zip(cums)
      .map { case ((id, _, tok), cum) => (id, tok, cum, (cum - tok) / L) }
      .sortBy(_._1)
    val got = SequencePacking.packs(Tables.documents(spark, sf001))
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq == expected.toSeq)
    // budget discipline: every pack's token total stays under L plus its
    // final (boundary-straddling) document, and all but the last pack
    // reach at least L tokens counting that straddler
    val byPack = expected.groupBy(_._4).toSeq.sortBy(_._1)
    assert(byPack.size > 1, "fixture produced a single pack — budget too big")
    val maxDoc = base.map(_._3).max
    byPack.init.foreach { case (p, ds) =>
      val total = ds.map(_._2).sum
      assert(total <= L + maxDoc, s"pack $p overflows: $total")
      assert(total >= L - maxDoc, s"pack $p underfills: $total")
    }
  }

  test("pack-fill histogram is the exact roll-up of the packs frame and " +
    "accounts for every document and token") {
    val docs = Tables.documents(spark, sf001)
    val packs = SequencePacking.packs(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))) // doc_id, tok, pack_id
    val L = SequencePacking.PackTokens
    val expect = packs.groupBy(_._3).values
      .map { ds => (ds.map(_._2).sum * 100 / L, ds.size.toLong, ds.map(_._2).sum) }
      .groupBy(_._1).toSeq
      .map { case (fill, ps) =>
        (fill, ps.size.toLong, ps.map(_._2).sum, ps.map(_._3).sum) }
      .sortBy(_._1)
    val got = SequencePacking.packFillHistogram(docs).orderBy("fill_pct")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.toSeq === expect)
    // conservation: the histogram accounts for every doc and token once
    assert(got.map(_._3).sum === packs.length.toLong)
    assert(got.map(_._4).sum === packs.map(_._2).sum)
    // all but (at most) the boundary fills cluster around 100 % — a pack
    // is never split, so fill ∈ [100 − maxDoc/L·100, 100 + maxDoc/L·100]
    val maxDoc = packs.map(_._2).max
    val lastPack = packs.map(_._3).max
    val nonFinal = packs.filter(_._3 != lastPack).groupBy(_._3).values
    nonFinal.foreach { ds =>
      val fill = ds.map(_._2).sum * 100 / L
      assert(fill >= 100 - maxDoc * 100 / L && fill <= 100 + maxDoc * 100 / L)
    }
  }

  test("mixture packing equals brute force over the manifest; replicas land in " +
    "independent positions; pack sizes hug the budget") {
    import graft.sampling.MixtureResample
    val docs = Tables.documents(spark, sf001)
    // brute-force: replay the manifest (copies per doc), then the
    // (doc_id, copy)-keyed hash order and prefix sum on the driver
    val manifest = MixtureResample.resample(docs, extraCols = Seq("text"))
      .collect().map(r => (r.getLong(0), r.getAs[Long]("copy"), r.getAs[String]("text")))
    def h60(s: String): Long = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
    }
    val base = manifest.map { case (id, copy, text) =>
      val h = h60(s"tb:$id:$copy")
      (id, copy, h, text.trim.split("\\s+").length.toLong)
    }
    val ordered = base.sortBy(t => (t._3 % TokenBudget.Buckets, t._3, t._1, t._2))
    val cums = ordered.scanLeft(0L)(_ + _._4).tail
    val L = SequencePacking.PackTokens
    val expected = ordered.zip(cums)
      .map { case ((id, copy, _, tok), cum) => (id, copy, tok, cum, (cum - tok) / L) }
      .sortBy(t => (t._1, t._2))
    val got = SequencePacking.packsMixture(docs)
      .orderBy("doc_id", "copy").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq === expected.toSeq)
    // the mixture must actually replicate (src0 is ×2.5 → copies exist) and
    // replicas must NOT be systematically co-packed: each copy gets its own
    // hash position, so same-doc same-pack collisions are rare accidents
    val multi = expected.groupBy(_._1).filter(_._2.length > 1)
    assert(multi.nonEmpty, "no replicated docs — mixture weights not applied")
    val coPacked = multi.values.count(rs => rs.map(_._5).distinct.length < rs.length)
    assert(coPacked.toDouble / multi.size < 0.5,
      s"$coPacked of ${multi.size} replicated docs share a pack — replicas are not independent")
    // budget discipline carries over to the mixture layout
    val byPack = expected.groupBy(_._5).toSeq.sortBy(_._1)
    assert(byPack.size > 1)
    val maxDoc = base.map(_._4).max
    byPack.init.foreach { case (p, ds) =>
      val total = ds.map(_._3).sum
      assert(total <= L + maxDoc, s"pack $p overflows: $total")
      assert(total >= L - maxDoc, s"pack $p underfills: $total")
    }
  }

  test("pack boundaries: offsets consistent with the packs frame, ranks dense") {
    val docs = graft.queries.Tables.documents(spark, sf001)
    val packed = SequencePacking.packs(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val out = SequencePacking.packBoundaries(docs).collect()
    assert(out.length === packed.size, "boundary manifest must cover every doc once")
    out.foreach { r =>
      val (tok, cum, packId) = packed(r.getLong(2))
      assert(r.getLong(0) === packId)
      assert(r.getLong(3) === cum - tok - packId * SequencePacking.PackTokens)
      assert(r.getLong(3) >= 0 && r.getLong(3) < SequencePacking.PackTokens,
        s"local offset ${r.getLong(3)} outside the pack")
      assert(r.getLong(4) === tok)
    }
    // ranks are dense 1..n per pack, ordered by offset
    out.groupBy(_.getLong(0)).foreach { case (p, rs) =>
      val sorted = rs.sortBy(_.getLong(1))
      assert(sorted.map(_.getLong(1)).sameElements(1L to rs.length), s"pack $p ranks")
      assert(sorted.map(_.getLong(3)).sameElements(sorted.map(_.getLong(3)).sorted),
        s"pack $p offsets out of rank order")
    }
  }
}
