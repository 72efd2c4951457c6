package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** File-level sampling over a genuinely multi-file parquet dataset. */
class SampledFilesSpec extends SparkSpec {

  private lazy val multiFileDir: String = {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_multifile_parquet"
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      Tables.documents(spark, sf01)
        .repartition(16, col("doc_id"))
        .write.mode("overwrite").parquet(dir)
    }
    dir
  }

  test("selects a deterministic subset of part files, never all-or-nothing at 0.5") {
    val s1 = SampledFiles(spark, multiFileDir, SamplingConfig(ratio = 0.5, seed = 42))
    val s2 = SampledFiles(spark, multiFileDir, SamplingConfig(ratio = 0.5, seed = 42))
    assert(s1.allFiles.size === 16)
    assert(s1.selectedFiles === s2.selectedFiles)
    assert(s1.selectedFiles.nonEmpty && s1.selectedFiles.size < 16)
    val s3 = SampledFiles(spark, multiFileDir, SamplingConfig(ratio = 0.5, seed = 99))
    assert(s1.selectedFiles !== s3.selectedFiles)
  }

  test("data reads exactly the selected files' rows") {
    val s = SampledFiles(spark, multiFileDir, SamplingConfig(ratio = 0.5, seed = 42))
    val direct = spark.read.parquet(s.selectedFiles: _*).count()
    assert(s.data.count() === direct)
    // and the scan's file list in the plan is the selected subset
    assert(s.data.count() < spark.read.parquet(multiFileDir).count())
  }

  test("HT-scaled count is an unbiased estimate within cluster-sampling noise") {
    val total = spark.read.parquet(multiFileDir).count().toDouble
    val s = SampledFiles(spark, multiFileDir, SamplingConfig(ratio = 0.5, seed = 42))
    val est = s.data.count() / s.ratio
    // 16 balanced clusters at p=0.5: rel-stddev ≈ sqrt((1-p)/(p·16)) ≈ 0.25.
    // Part-file names carry fresh write-time UUIDs, so the draw differs per
    // machine — assert within 3σ, which any draw satisfies w.p. ~0.997.
    assert(math.abs(est - total) / total < 0.75, s"estimate $est vs total $total")
  }

  test("ratio 1.0 selects everything; empty selection yields an empty, schema-correct frame") {
    val all = SampledFiles(spark, multiFileDir, SamplingConfig.Exact)
    assert(all.selectedFiles === all.allFiles)
    val none = SampledFiles(spark, multiFileDir, SamplingConfig(ratio = 1e-9, seed = 42))
    assert(none.selectedFiles.isEmpty)
    assert(none.data.count() === 0)
    assert(none.data.schema === all.data.schema)
  }

  test("single-file input degrades gracefully (the file is the one cluster)") {
    val single = SampledFiles(
      spark, s"$sf001/documents.parquet", SamplingConfig(ratio = 0.5, seed = 42))
    assert(single.allFiles.size === 1)
    assert(single.report().totalFiles === 1)
  }

  test("XML shard directories sample at file level (whole shards skipped before parse)") {
    import org.apache.spark.sql.functions.col
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_multifile_xml"
    val d = new java.io.File(dir)
    if (!d.exists()) {
      d.mkdirs()
      val pages = graft.sources.XmlSource
        .toPageXml(Tables.documents(spark, sf001).orderBy("doc_id"))
        .collect().map(_.getString(0))
      pages.grouped((pages.length + 7) / 8).zipWithIndex.foreach { case (chunk, i) =>
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$dir/shard$i.xml"),
          chunk.mkString("<pages>\n", "\n", "\n</pages>"))
      }
    }
    val s = SampledFiles.xml(spark, dir, SamplingConfig(ratio = 0.5, seed = 42))
    assert(s.allFiles.size === 8)
    assert(s.selectedFiles.nonEmpty && s.selectedFiles.size < 8)
    val expected = spark.read.option("rowTag", "page").format("xml")
      .load(s.selectedFiles: _*).count()
    assert(s.data.count() === expected)
    assert(s.data.columns.contains("text"))
    // deterministic selection: the docs read are exactly the chosen shards'
    val again = SampledFiles.xml(spark, dir, SamplingConfig(ratio = 0.5, seed = 42))
    assert(again.selectedFiles === s.selectedFiles)
    assert(s.data.select(col("id")).count() === expected)
  }

  test("raw text corpora sample at file level too (unchosen shards never opened)") {
    val dir = s"${System.getProperty("java.io.tmpdir")}/graft_multifile_text"
    if (!new java.io.File(dir, "_SUCCESS").exists()) {
      Tables.documents(spark, sf01)
        .repartition(16, col("doc_id"))
        .select(col("text"))
        .write.mode("overwrite").text(dir)
    }
    val s = SampledFiles.text(spark, dir, SamplingConfig(ratio = 0.5, seed = 42))
    assert(s.allFiles.size === 16)
    assert(s.selectedFiles.nonEmpty && s.selectedFiles.size < 16)
    // the sampled relation is the reference's record shape and composes
    // with the word-count pipeline directly
    assert(s.data.columns.toSeq === Seq("value"))
    val direct = spark.read.text(s.selectedFiles: _*).count()
    assert(s.data.count() === direct)
    assert(graft.queries.ReferenceQueries.wordCountLines(s.data).count() > 0)
  }
}
