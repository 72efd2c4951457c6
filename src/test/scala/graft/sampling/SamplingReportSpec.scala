package graft.sampling

import org.scalatest.funsuite.AnyFunSuite

/** The report text is a cross-run PROTOCOL (the reference's comparator
  * machine-parsed prior runs' result.txt, RSMRResultComparator.java:91-109)
  * — so emit → parse must round-trip.
  */
class SamplingReportSpec extends AnyFunSuite {

  test("report text round-trips through parse") {
    val r = SamplingReport(jobId = 7, total = 123456L, sampled = 12389L,
      designedRate = 0.1, confidence = 0.95, timeCostSec = 3.21)
    val p = SamplingReport.parse(r.toString)
    assert(p.jobId === r.jobId)
    assert(p.total === r.total)
    assert(p.sampled === r.sampled)
    assert(math.abs(p.designedRate - r.designedRate) <= 0.00005) // 2-dp percent
    assert(p.confidence === r.confidence)
    assert(math.abs(p.timeCostSec - r.timeCostSec) <= 0.005)
    // derived fields recompute exactly: they depend only on parsed exact counts
    assert(p.actualRate === r.actualRate)
    assert(p.errorRate === r.errorRate)
  }
}
