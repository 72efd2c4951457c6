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
}
