package graft.tools

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ad-hoc component timer (dev diagnostic): time named sub-plans of the
  * curation family to localize CPU cost. Usage:
  * `runMain graft.tools.MicroTime <name...>` with names from the wired map.
  */
object MicroTime {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]", sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "32"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = graft.queries.Tables.documents(spark, sfDir)

    val parts: Map[String, () => DataFrame] = Map(
      "verdicts" -> (() => graft.text.CurationPipeline.verdicts(docs)),
      "repetition" -> (() => graft.text.TextAnalysis.repetitionSignals(docs)),
      "quality" -> (() => graft.text.TextAnalysis.qualityScore(docs)),
      "langid" -> (() => graft.text.TextAnalysis.languageId(docs)),
      "words_only" -> (() =>
        graft.queries.Tables.parallelismFloor(docs)
          .select(col("doc_id"), graft.dedup.Hashing.words(col("text")).as("__w"))
          .select(col("doc_id"), size(col("__w")).as("n"))),
      "floor_only" -> (() =>
        graft.queries.Tables.parallelismFloor(docs).select(col("doc_id"), col("text"))),
      "words_explode" -> (() =>
        graft.queries.Tables.parallelismFloor(docs)
          .select(col("doc_id"), explode(graft.dedup.Hashing.words(col("text"))).as("__t"))
          .filter(col("__t") =!= "")),
      "words_count" -> (() =>
        graft.queries.Tables.parallelismFloor(docs)
          .select(col("doc_id"), explode(graft.dedup.Hashing.words(col("text"))).as("__t"))
          .filter(col("__t") =!= "")
          .groupBy(col("doc_id"), col("__t")).agg(count(lit(1)).as("__c"))),
      "words_stats" -> (() =>
        graft.queries.Tables.parallelismFloor(docs)
          .select(col("doc_id"), explode(graft.dedup.Hashing.words(col("text"))).as("__t"))
          .filter(col("__t") =!= "")
          .groupBy(col("doc_id"), col("__t")).agg(count(lit(1)).as("__c"))
          .groupBy(col("doc_id"))
          .agg(sum(col("__c")).as("n"), count(lit(1)).as("nd"), max(col("__c")).as("top"))),
      "bigrams_explode" -> (() =>
        graft.dedup.Hashing.explodeShingles(
          graft.queries.Tables.parallelismFloor(docs), 2)),
      // r18 quality-cost decomposition: which term of qualitySignalCols
      // dominates the 6 s process CPU the quality scan shows?
      "special_re" -> (() =>
        graft.queries.Tables.parallelismFloor(docs)
          .select(col("doc_id"),
            length(regexp_replace(lower(col("text")), "[a-z0-9 ]", ""))
              .cast("long").as("n_special"))),
      "special_count" -> (() =>
        graft.queries.Tables.parallelismFloor(docs)
          .select(col("doc_id"),
            (length(col("text")) -
              regexp_count(lower(col("text")), lit("[a-z0-9 ]")))
              .cast("long").as("n_special"))),
      "stop_count" -> (() =>
        graft.queries.Tables.parallelismFloor(docs)
          .select(col("doc_id"),
            graft.functions.CountInSet.countInSet(
              graft.dedup.Hashing.words(col("text")),
              graft.text.TextAnalysis.Markers.head._2).as("n_stop"))),
      "clf_synth" -> (() =>
        graft.sources.AccessLog.synthesize(
          graft.queries.Tables.events(spark, sfDir))),
      "clf_parsed" -> (() =>
        graft.sources.AccessLog.parse(graft.sources.AccessLog.synthesize(
          graft.queries.Tables.events(spark, sfDir)))),
      "lang_scores" -> (() => {
        val w = col("__w")
        graft.queries.Tables.parallelismFloor(docs)
          .select(col("doc_id"), graft.dedup.Hashing.words(col("text")).as("__w"))
          .select(Seq(col("doc_id")) ++ graft.text.TextAnalysis.Markers.map {
            case (lang, ms) =>
              graft.functions.CountInSet.countInSet(w, ms).as(s"s_$lang")
          }: _*)
      }))

    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    def cpuNow(): Double = osBean.map(_.getProcessCpuTime / 1e9).getOrElse(-1.0)

    // optional in-process stack sampler over executor threads (set
    // MICRO_SAMPLE=1): tallies top-of-stack frames to localize where the
    // executor CPU goes without an external profiler
    val sampling = sys.env.get("MICRO_SAMPLE").contains("1")
    val frames = scala.collection.mutable.HashMap.empty[String, Int].withDefaultValue(0)
    @volatile var keepSampling = true
    val sampler = new Thread(() => {
      while (keepSampling) {
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty) {
            val top = st.take(5).map(f => s"${f.getClassName}.${f.getMethodName}")
              .mkString(" < ")
            frames(top) += 1
          }
        }
        Thread.sleep(3)
      }
    })
    if (sampling) { sampler.setDaemon(true); sampler.start() }

    val names = if (args.nonEmpty) args.toSeq else parts.keys.toSeq.sorted
    names.foreach { n =>
      val build = parts(n)
      build().write.format("noop").mode("overwrite").save() // warmup
      spark.catalog.clearCache()
      val trials = (1 to 3).map { _ =>
        val c0 = cpuNow(); val t0 = System.nanoTime()
        build().write.format("noop").mode("overwrite").save()
        val r = ((System.nanoTime() - t0) / 1e9, cpuNow() - c0)
        spark.catalog.clearCache()
        r
      }
      val wall = trials.map(_._1).min
      val cpu = trials.map(_._2).min
      println(f"[micro] $n%-12s wall=$wall%6.2fs cpu=$cpu%6.1fs  (cpu trials ${trials.map(t => f"${t._2}%.1f").mkString("/")})")
    }
    if (sampling) {
      keepSampling = false
      Thread.sleep(50)
      println("[micro] hottest sampled executor frames:")
      frames.toSeq.sortBy(-_._2).take(15).foreach { case (f, c) =>
        println(f"  $c%5d  $f")
      }
    }
    spark.stop()
  }
}
