package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ORC ingestion — the second columnar format beside parquet (Spark ships
  * the ORC reader/writer natively; the reference had exactly one input
  * representation, text — SURVEY.md §2.1 — so every additional
  * self-describing columnar source is engine surface beyond parity).
  *
  * What matters at 100 TB is that the ORC scan keeps parquet's pruning
  * properties: column pruning reaches the stripe reader (a wordcount over
  * a 5-column table must read ONE column's bytes) and predicate pushdown
  * reaches stripe/row-group indexes. OrcSourceSpec pins the ReadSchema of
  * the executed scan to the single projected column.
  */
object OrcSource {

  /** Render the FULL documents table (all 5 columns) to an ORC fixture
    * once per corpus content digest — full-width so the wordcount over it
    * proves column pruning, not just format decode.
    */
  def fixtureOrcPath(spark: SparkSession, dir: String): String = {
    val digest = graft.queries.Tables.contentDigest(s"$dir/documents.parquet")
    val path = s"${System.getProperty("java.io.tmpdir")}/graft_docs_orc_$digest"
    val done = new java.io.File(path, "_SUCCESS")
    if (!done.exists()) {
      spark.read.parquet(s"$dir/documents.parquet")
        .orderBy("doc_id")
        .write.mode("overwrite").orc(path)
    }
    path
  }

  def readDocuments(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)
}
