package graft

import graft.SparkSpec
import graft.queries.{ReferenceQueries => RQ, Tables}

/** The full experiment protocol at sf0.001: exact + ladder, K1 outputs,
  * reports, error rates — and the reference's qualitative claim that error
  * shrinks as the ratio grows.
  */
class RatioLadderSpec extends SparkSpec {

  test("ladder runs end-to-end; error rates are finite and ordered sensibly") {
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_ladder_test"
    val rungs = RatioLadder.run(
      Tables.events(spark, sf001),
      RQ.logHost(_),
      Seq("host"),
      Seq(1.0, 0.5, 0.1),
      out)
    assert(rungs.map(_.ratio) === Seq(0.5, 0.1))
    rungs.foreach { r =>
      assert(r.dataErrorRate >= 0.0 && r.dataErrorRate < 1.0)
      assert(r.report.total === Tables.events(spark, sf001).count())
      assert(r.report.sampled > 0)
      assert(new java.io.File(s"$out/ratio_${r.ratio}/report.json").exists())
    }
    // more sample → less error (deterministic with the fixed seed)
    assert(rungs(0).dataErrorRate < rungs(1).dataErrorRate)
    // K1 outputs exist and are non-empty
    assert(new java.io.File(s"$out/exact").listFiles().exists(_.getName.endsWith(".txt")))
  }

  test("ladder across the reference's job families: word/char/CLF/wireless rungs " +
    "stay within the T4 bound on the additive total") {
    import org.apache.spark.sql.functions._
    val out = s"${System.getProperty("java.io.tmpdir")}/graft_ladder_families"
    val chosen =
      Set("charcount", "log_size", "wireless", "wordcount", "text_quality", "text_tokens")
    val fams = RatioLadder.families(spark, sf001).filter(f => chosen.contains(f.name))
    assert(fams.size === chosen.size)
    fams.foreach { f =>
      val rungs = RatioLadder.runFamily(f, Seq(1.0, 0.5), out)
      assert(rungs.map(_.ratio) === Seq(0.5))
      val exactTotal = f.query(f.source)
        .agg(sum(col(f.countCol).cast("double"))).head().getDouble(0)
      rungs.foreach { r =>
        assert(r.dataErrorRate >= 0.0 && r.dataErrorRate < 1.0, s"${f.name}: per-key error")
        // the T4 bound speaks about the ADDITIVE TOTAL estimate (that's what
        // Cochran's formula bounds), so judge the HT-scaled total — read back
        // through the K1 sink (which carries the reference's UNSCALED sample
        // counts) and apply the comparator's 1/ratio scale-up here
        val estTotal = graft.sinks.TextKVSink
          .read(spark, s"$out/${f.name}/ratio_${r.ratio}/out")
          .agg(sum(col("value").cast("double"))).head().getDouble(0) / r.ratio
        val relErr = math.abs(estTotal - exactTotal) / exactTotal
        // 3× the single-sd bound: deterministic with the fixed seed, and a
        // regression that breaks HT scaling or sampling lands far outside
        assert(relErr <= 3 * r.report.errorRate,
          s"${f.name} ratio ${r.ratio}: total rel-err $relErr vs T4 bound ${r.report.errorRate}")
      }
    }
  }

  test("declared ladder query: exact rung reports zero error, sampled rungs " +
    "report positive kept counts and a T4 bound matching Stats.errorBound") {
    import org.apache.spark.sql.functions._
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001).select(col("doc_id"), col("text"))
    val rows = RatioLadder.wordcountLadderU(docs).orderBy(col("pct").desc).collect()
    assert(rows.map(_.getLong(0)).toSeq === Seq(100L, 50L, 25L, 10L))
    val exactRung = rows.head
    // pct=100: keep-all, scale 1 — the comparator must measure exactly 0
    assert(exactRung.getLong(2) === 0L) // sum_abs_diff
    assert(exactRung.getLong(3) === 0L) // data_error_bp
    assert(exactRung.getLong(4) === exactRung.getLong(5)) // kept == total
    assert(exactRung.getDouble(6) === 0.0) // FPC zeroes the bound at n == N
    rows.tail.foreach { r =>
      val (nDocs, nKept) = (r.getLong(4), r.getLong(5))
      assert(nKept > 0 && nKept < nDocs, s"rung ${r.getLong(0)}")
      // same chain as the scalar reference implementation
      assert(r.getDouble(6) ===
        graft.sampling.Stats.errorBound(0.95, nDocs, nKept))
      // sum_exact is rung-invariant (it's the exact side of the join)
      assert(r.getLong(1) === exactRung.getLong(1))
    }
  }
}
