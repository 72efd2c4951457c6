package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll

/** Shared local SparkSession for engine specs.
  *
  * One session per JVM (tests fork once, sbt reuses it across suites via
  * getOrCreate) with the same confs the driver harness uses, so specs see
  * the plans Verify/Bench will see.
  */
trait SparkSpec extends AnyFunSuite with BeforeAndAfterAll {
  lazy val spark: SparkSession = SparkSpec.session
  def sf001 = "/root/testdata/sf0.001"
  def sf01 = "/root/testdata/sf0.01"
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
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
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
