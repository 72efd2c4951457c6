package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

/** [[Decontaminate]] against a brute-force gram-overlap recomputation, plus
  * the broadcast-probe plan shape its 100 TB argument rests on.
  */
class DecontaminateSpec extends SparkSpec {

  private def grams(text: String): Set[String] = {
    val w = text.toLowerCase.split("[^a-z0-9]+", -1)
    if (w.length < Decontaminate.GramK) Set.empty
    else w.sliding(Decontaminate.GramK).map(_.mkString(" ")).toSet
  }

  test("clean keeps exactly the non-bench docs with no 8-gram overlap") {
    val docs = Tables.documents(spark, sf001)
      .select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val benchGrams = docs
      .filter(_._1 % Decontaminate.BenchEvery == 0)
      .flatMap(d => grams(d._2)).toSet
    val expected = docs
      .filter(_._1 % Decontaminate.BenchEvery != 0)
      .filter(d => grams(d._2).intersect(benchGrams).isEmpty)
      .map(_._1).sorted
    val got = Decontaminate.clean(Tables.documents(spark, sf001))
      .orderBy("doc_id").collect().map(_.getLong(0))
    assert(got.toSeq == expected.toSeq)
    // sanity: the fixture actually exercises both outcomes
    val corpusSize = docs.count(_._1 % Decontaminate.BenchEvery != 0)
    assert(got.length < corpusSize, "no doc was flagged — fixture too clean")
    assert(got.nonEmpty)
  }

  test("the benchmark gram probe is a broadcast join") {
    // string check, not collect: AdaptiveSparkPlanExec hides its inner plan
    // from TreeNode.collect until stages materialize
    val plan = Decontaminate.clean(Tables.documents(spark, sf001))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"no BroadcastHashJoin in:\n$plan")
  }
}
