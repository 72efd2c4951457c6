package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import graft.compare.ResultComparator
import graft.queries.{ReferenceQueries => RQ, Tables}
import graft.sampling.{SamplingConfig, SamplingReport}
import graft.sinks.{ReportSink, TextKVSink}

/** The reference's end-to-end experiment protocol as a runnable harness:
  * run a query exact (ratio 1.0) and at a ladder of sampling ratios, write
  * each run's key-sorted K1 output + K2 report, and measure each sampled
  * run's data error rate against the exact run — exactly what
  * `randWordCount.sh:22-26` + `RSMRResultComparator.java:43-88` did with
  * shell scripts and a standalone JVM tool, here as one Spark driver
  * program.
  *
  * Usage: `runMain graft.RatioLadder <sfDir> <outDir> [r1,r2,…]`
  * (default ladder 1.0,0.5,0.25,0.1,0.01 — the reference's published
  * ladder, README.md:48).
  */
object RatioLadder {

  final case class Rung(
      ratio: Double,
      report: SamplingReport,
      dataErrorRate: Double,
      wallSec: Double)

  /** Run the ladder for one count-shaped query. */
  def run(
      source: DataFrame,
      query: DataFrame => DataFrame,
      keys: Seq[String],
      ratios: Seq[Double],
      outDir: String,
      countCol: String = "cnt"): Seq[Rung] = {
    val exact = query(source)
    TextKVSink.write(exact, keys.head, countCol, s"$outDir/exact")
    ratios.filter(_ < 1.0).map { r =>
      val t0 = System.nanoTime()
      val (s, est) = RQ.sampled(source, SamplingConfig(ratio = r), query, countCol)
      TextKVSink.write(est, keys.head, s"est_$countCol", s"$outDir/ratio_$r")
      val err = ResultComparator.dataErrorRate(exact, est, keys, countCol, s"est_$countCol")
      val rpt = s.report()
      ReportSink.emit(rpt, s"$outDir/ratio_$r/report.json")
      Rung(r, rpt, err, (System.nanoTime() - t0) / 1e9)
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val outDir = args.lift(1).getOrElse("/tmp/graft_ladder")
    val ratios = args.lift(2)
      .map(_.split(",").map(_.toDouble).toSeq)
      .getOrElse(Seq(1.0, 0.5, 0.25, 0.1, 0.01))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()

    val rungs = run(
      Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
      RQ.wordCount(_), Seq("word"), ratios, outDir)
    rungs.foreach { r =>
      println(r.report.toString)
      // the comparator's terminal line (RSMRResultComparator.java:80-88)
      println(f"[Data error rate] ${r.dataErrorRate * 100}%.2f%%\n")
    }
    spark.stop()
  }
}
