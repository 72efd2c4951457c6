package graft.sources

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.{ReferenceQueries => RQ, Tables}

/** ORC ingestion: content fidelity vs the parquet original, and the
  * column-pruning property the 100 TB argument rests on.
  */
class OrcSourceSpec extends SparkSpec {

  test("wordcount over the ORC fixture equals the parquet wordcount") {
    val viaOrc = RQ.wordCount(
      OrcSource.readDocuments(spark, OrcSource.fixtureOrcPath(spark, sf001)))
      .orderBy("word").collect().map(r => (r.getString(0), r.getLong(1)))
    val direct = RQ.wordCount(Tables.documents(spark, sf001))
      .orderBy("word").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(viaOrc.sameElements(direct))
  }

  test("a single-column projection prunes the ORC scan to that column") {
    val plan = OrcSource.readDocuments(spark, OrcSource.fixtureOrcPath(spark, sf001))
      .select(col("text"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<text:string>"),
      s"ORC scan did not prune to text:\n$plan")
  }
}
