package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{ReferenceQueries => RQ, Tables}

/** The SPLITTABLE-compression property of the bzip2 ingestion path
  * (VERDICT r5 §missing 1; the reference's reader handled splittable and
  * non-splittable codecs through the same seam,
  * RandomizedXMLRecordReader.java:81-106).
  *
  * Spark's text source asks the codec whether a file can split:
  * BZip2Codec is a SplittableCompressionCodec (readers re-synchronize on
  * the 48-bit block magic), gzip is not. Hadoop's bzip2 writer hardcodes
  * 900 KB uncompressed blocks, so a multi-SPLIT read needs a multi-block
  * file — the fixture here repeats lines past ~2 MB to get ≥3 blocks,
  * then the spec pins (a) >1 partition under a small maxPartitionBytes,
  * (b) rows actually arriving from MULTIPLE partitions (real parallel
  * decode, not one worker + empty peers), (c) exact content equality with
  * the uncompressed read, and (d) the same file read as `.gz` staying ONE
  * partition — the property is the codec's, not the scan's.
  */
class Bzip2SplitSpec extends SparkSpec {
  import spark.implicits._

  private val tmpdir = System.getProperty("java.io.tmpdir")

  private def writeRepeated(path: String, compression: String): Unit = {
    val f = new java.io.File(path, "_SUCCESS")
    if (!f.exists()) {
      // ~40k distinct lines ≈ 2.6 MB uncompressed → ≥3 bzip2 blocks
      spark.range(40000)
        .select(concat(lit("line "), col("id"), lit(" "), md5(col("id").cast("string")))
          .as("value"))
        .coalesce(1)
        .write.mode("overwrite").option("compression", compression).text(path)
    }
  }

  private def withMaxPartitionBytes[A](bytes: Long)(body: => A): A = {
    val key = "spark.sql.files.maxPartitionBytes"
    val old = spark.conf.get(key)
    spark.conf.set(key, bytes.toString)
    try body
    finally spark.conf.set(key, old)
  }

  test("a single multi-block .bz2 file reads as multiple splits; gzip stays at one") {
    val bz2 = s"$tmpdir/graft_bz2_split_fixture"
    val gz = s"$tmpdir/graft_gz_split_fixture"
    writeRepeated(bz2, "bzip2")
    writeRepeated(gz, "gzip")
    withMaxPartitionBytes(128 * 1024) {
      val bzLines = TextLines.readLines(spark, bz2)
      val partSizes = bzLines.rdd
        .mapPartitions(it => Iterator.single(it.size)).collect()
      assert(partSizes.length > 1, s"expected >1 split, got ${partSizes.length}")
      // rows must come from MULTIPLE splits — parallel decode, not one
      // worker with empty peers
      assert(partSizes.count(_ > 0) > 1,
        s"expected >1 non-empty split, sizes=${partSizes.mkString(",")}")
      assert(partSizes.sum === 40000)
      // the same data as gzip: non-splittable → exactly one partition
      val gzParts = TextLines.readLines(spark, gz).rdd.getNumPartitions
      assert(gzParts === 1, s"gzip must not split, got $gzParts partitions")
      // content equality across the split boundaries (no torn/dup lines)
      val bzSet = bzLines.orderBy("value").collect().map(_.getString(0))
      val gzSet = TextLines.readLines(spark, gz)
        .orderBy("value").collect().map(_.getString(0))
      assert(bzSet.sameElements(gzSet))
    }
  }

  test("wordcount over the bz2 corpus fixture equals the parquet wordcount") {
    val viaBz2 = RQ.wordCountLines(
      TextLines.readLines(spark, TextLines.fixtureBz2Path(spark, sf001)))
      .orderBy("word").collect().map(r => (r.getString(0), r.getLong(1)))
    val direct = RQ.wordCount(Tables.documents(spark, sf001))
      .orderBy("word").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaBz2.sameElements(direct))
  }
}
