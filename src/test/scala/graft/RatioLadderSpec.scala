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
}
