package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Raw text-file ingestion (reference operator S1's source format): every
  * reference corpus is a plain text file read line-by-line
  * (RandomizedLineRecordReader.java:33). `spark.read.text` is the native
  * equivalent — splittable, one `value` string column per line; sampling
  * composes on top exactly as the reference's sampled reader did below the
  * mapper.
  */
object TextLines {

  /** Write a deterministic one-line-per-document text fixture for `dir`
    * (once per corpus) and return its path.
    */
  def fixturePath(spark: SparkSession, dir: String): String = {
    // content-fingerprinted (ADVICE r5): regenerated source data gets a
    // fresh fixture instead of silently reusing the stale rendering
    val digest = graft.queries.Tables.contentDigest(s"$dir/documents.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_$digest"
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.exists()) {
      spark.read.parquet(s"$dir/documents.parquet")
        .orderBy("doc_id")
        .select(col("text"))
        .coalesce(1)
        .write.mode("overwrite").text(path)
    }
    path
  }

  /** Gzipped variant of [[fixturePath]] — compressed-codec ingestion, the
    * reference's XML reader handled splittable and non-splittable codecs
    * (RandomizedXMLRecordReader.java:81-106). Spark's text source detects
    * `.gz` by extension and decompresses transparently. One gz part mirrors
    * the reference's single compressed input; gzip is NOT splittable, so at
    * 100 TB the corpus must be many gz files (parallelism = file count) or
    * a splittable codec (bzip2/zstd-seekable) — the read path is identical.
    */
  def fixtureGzPath(spark: SparkSession, dir: String): String = {
    val digest = graft.queries.Tables.contentDigest(s"$dir/documents.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_gz_$digest"
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.exists()) {
      spark.read.parquet(s"$dir/documents.parquet")
        .orderBy("doc_id")
        .select(col("text"))
        .coalesce(1)
        .write.mode("overwrite").option("compression", "gzip").text(path)
    }
    path
  }

  /** Bzip2 variant of [[fixtureGzPath]] — the SPLITTABLE compressed codec
    * (the reference's XML reader distinguished exactly this:
    * RandomizedXMLRecordReader.java:81-106 seeks split boundaries through a
    * SplittableCompressionCodec, vs stream-from-start for gzip). Spark's
    * text source keeps the same property: a `.bz2` file scans as MULTIPLE
    * input splits (the codec re-synchronizes on bzip2 block markers), so
    * one big compressed file still parallelizes — the 100 TB answer gzip
    * can't give. Hadoop's writer hardcodes 900 KB blocks ("BZh9"), so
    * multi-split behavior needs a >900 KB corpus; Bzip2SplitSpec pins it
    * on a purpose-built multi-block file.
    */
  def fixtureBz2Path(spark: SparkSession, dir: String): String = {
    val digest = graft.queries.Tables.contentDigest(s"$dir/documents.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_text_bz2_$digest"
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.exists()) {
      spark.read.parquet(s"$dir/documents.parquet")
        .orderBy("doc_id")
        .select(col("text"))
        .coalesce(1)
        .write.mode("overwrite").option("compression", "bzip2").text(path)
    }
    path
  }

  /** One `value` column per line — the reference's record shape. */
  def readLines(spark: SparkSession, path: String): DataFrame =
    spark.read.text(path)

  /** JSONL fixture: one `{"doc_id":…,"text":…}` object per line. */
  def fixtureJsonlPath(spark: SparkSession, dir: String): String =
    writeFixture(spark, dir, "jsonl") { docs => path =>
      docs.select(col("doc_id"), col("text")).coalesce(1)
        .write.mode("overwrite").json(path)
    }

  /** CSV fixture with header, standard quoting. */
  def fixtureCsvPath(spark: SparkSession, dir: String): String =
    writeFixture(spark, dir, "csv") { docs => path =>
      docs.select(col("doc_id"), col("text")).coalesce(1)
        .write.mode("overwrite").option("header", "true").csv(path)
    }

  private def writeFixture(spark: SparkSession, dir: String, kind: String)(
      f: org.apache.spark.sql.DataFrame => String => Unit): String = {
    val digest = graft.queries.Tables.contentDigest(s"$dir/documents.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_$digest"
    if (!new java.io.File(path, "_SUCCESS").exists())
      f(spark.read.parquet(s"$dir/documents.parquet").orderBy("doc_id"))(path)
    path
  }

  /** Schema-declared JSONL ingestion (schema-on-read with an EXPLICIT
    * schema — no inference scan, the only acceptable form at 100 TB).
    */
  def readJsonl(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("doc_id BIGINT, text STRING")
      .json(path)

  /** Schema-declared CSV ingestion (quoted fields, header skipped). */
  def readCsv(spark: SparkSession, path: String): DataFrame =
    spark.read
      .schema("doc_id BIGINT, text STRING")
      .option("header", "true")
      .csv(path)
}
