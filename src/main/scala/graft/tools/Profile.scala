package graft.tools

import org.apache.spark.sql.functions._

import graft.dedup.{DedupCorpus, Hashing, MinHashLSH}
import graft.queries.Tables

/** Scratch stage-cost profiler for the MinHash signature pipeline (dev tool,
  * not part of the engine surface).
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = graft.GraftSession.builder("local[32]", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(name: String)(f: => Long): Unit = {
      f // warmup
      val t = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f; ((System.nanoTime() - t0) / 1e9, n)
      }
      println(f"$name%-32s ${t.map(_._1).sorted.apply(1)}%8.2fs  rows=${t.head._2}")
    }

    val corpus = DedupCorpus.augment(Tables.documents(spark, sfDir))
    // deliberately reproduces the per-element re-split trap for comparison
    val sh = corpus.select(
      col("doc_id"), explode(Hashing.shingles(Hashing.words(col("text")), 3)).as("shingle"))
    // variant: words materialized as an attribute before the shingle lambda
    val k = 3
    val shingleOfW = when(size(col("__w")) < k, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(col("__w")) - k),
        i => array_join(slice(col("__w"), i + lit(1), lit(k)), " ")))
    val shMat = corpus
      .select(col("doc_id"), Hashing.words(col("text")).as("__w"))
      .select(col("doc_id"), explode(shingleOfW).as("shingle"))
    // variant: barrier version (explode-of-one struct stops re-inlining)
    val shBar = corpus
      .select(col("doc_id"), explode(array(struct(Hashing.words(col("text")).as("w")))).as("__s"))
      .select(col("doc_id"), col("__s.w").as("__w"))
      .select(col("doc_id"), explode(shingleOfW).as("shingle"))

    time("corpus scan+augment") { corpus.count() }
    time("explode shingles INLINE-TRAP") { sh.count() }
    time("explode shingles MATERIALIZED") { shMat.count() }
    time("explode shingles BARRIER") { shBar.count() }
    time("explodeShingles (engine path)") { Hashing.explodeShingles(corpus, 3).count() }
    time("explode+md5hash (sum)") {
      sh.select((Hashing.hash60(col("shingle")) % MinHashLSH.Prime).as("hv"))
        .agg(sum("hv")).head(); 1L
    }
    time("explode+xxhash64 (sum)") {
      sh.select((xxhash64(col("shingle")) % MinHashLSH.Prime).as("hv"))
        .agg(sum("hv")).head(); 1L
    }
    time("full signatures") { MinHashLSH.signatures(corpus).count() }
    time("sig+pairs cold") {
      val n = MinHashLSH.nearDupPairs(MinHashLSH.signatures(corpus)).count()
      spark.catalog.clearCache(); n
    }
    spark.stop()
  }
}
