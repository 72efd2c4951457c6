package graft.tools

import org.apache.spark.sql.SparkSession

/** Single-query micro-bench (dev tool): time named declared queries with
  * the Bench harness discipline (noop sink, warmup + median-of-3, process
  * CPU next to wall) without paying for the whole 90-query sweep — for
  * before/after checks on one operator.
  *
  * Usage: `runMain graft.tools.TimeQuery <query> [<query> ...]`;
  * env SPARK_GRAFT_SF_DIR picks the fixture (default sf0.1).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "pass at least one declared query name")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      // always the serialized sort shuffle writer: bypass-merge opens and
      // merges R files PER MAP TASK, a syscall storm at small R that
      // measured 6x the CPU of the whole aggregation it served; at real
      // scale R > 200 disables bypass anyway, so this just makes local
      // behavior match the cluster path (one file + index per map task)
      .config("spark.shuffle.sort.bypassMergeThreshold", "1")
      // JVM case mappings, not ICU (the Spark 4 default): lower() via ICU
      // full case mapping was the hottest sampled frame across the text
      // family, and every tokenizer here discards non-[a-z0-9] right after
      // lowercasing, so the mappings agree wherever the engine looks;
      // ASCII corpora take UTF8String's vectorized fast path either way
      // only with ICU off (pre-4.0 behavior)
      .config("spark.sql.icu.caseMappings.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean match {
      case b: com.sun.management.OperatingSystemMXBean => Some(b)
      case _ => None
    }
    def cpuNow(): Long = osBean.map(_.getProcessCpuTime).getOrElse(-1L)
    args.foreach { name =>
      val build = graft.SparkEntry.queries.getOrElse(
        name, sys.error(s"unknown query: $name"))
      def once(): (Double, Double) = {
        val c0 = cpuNow(); val t0 = System.nanoTime()
        build(spark, sfDir).write.format("noop").mode("overwrite").save()
        val w = (System.nanoTime() - t0) / 1e9
        val c = if (c0 < 0) -1.0 else (cpuNow() - c0) / 1e9
        spark.catalog.clearCache()
        (w, c)
      }
      once() // warmup
      val ts = (1 to 3).map(_ => once())
      val wall = ts.map(_._1).sorted.apply(1)
      val cpu = ts.map(_._2).sorted.apply(1)
      println(f"[timeq] $name%-32s wall=$wall%.2fs cpu=$cpu%.1fs " +
        f"(trials ${ts.map(t => f"${t._1}%.2f").mkString("/")})")
    }
    spark.stop()
  }
}
