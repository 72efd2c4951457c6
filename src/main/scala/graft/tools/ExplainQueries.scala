package graft.tools

import org.apache.spark.sql.SparkSession

/** Plan-audit helper: print the formatted physical plan of the named
  * declared queries (all of them when none are named) — the `.explain`
  * loop the build discipline calls for after each operator lands.
  * Usage: runMain graft.tools.ExplainQueries <sfDir> [queryName...]
  */
object ExplainQueries {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq else graft.SparkEntry.queries.keys.toSeq.sorted
    val spark = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.sql.shuffle.partitions", "4")
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
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
