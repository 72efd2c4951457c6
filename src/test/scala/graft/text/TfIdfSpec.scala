package graft.text

import org.apache.spark.sql.functions.col

import graft.SparkSpec
import graft.queries.Tables

class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("hand-golden: corpus-wide terms rank below doc-specific ones") {
    val docs = Seq(
      (1L, "shared shared apple apple apple"),
      (2L, "shared banana"),
      (3L, "shared cherry cherry")
    ).toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs).orderBy("doc_id", "rn")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    // doc 1: apple tf=3 df=1 → 3_000_000; shared tf=2 df=3 → 666_666
    assert(out.filter(_._1 == 1L).map(r => (r._2, r._5)).toSeq ===
      Seq(("apple", 3000000L), ("shared", 666666L)))
    // doc 2: banana 1_000_000 beats shared 333_333
    assert(out.filter(_._1 == 2L).map(_._2).toSeq === Seq("banana", "shared"))
    // doc 3: cherry tf=2 df=1 → 2_000_000
    assert(out.filter(_._1 == 3L).head._2 === "cherry")
    // df is corpus-wide: shared appears in all three docs
    assert(out.filter(_._2 == "shared").forall(_._4 === 3L))
  }

  test("ties break on the word, ranks are dense 1..k, k respected") {
    val docs = Seq((7L, "zz aa zz aa mm")).toDF("doc_id", "text")
    val out = TfIdf.topTerms(docs, k = 2).orderBy("rn")
      .as[(Long, String, Long, Long, Long, Long)].collect()
    // aa and zz tie at tf=2 df=1; aa wins the word tie-break
    assert(out.map(r => (r._2, r._6)).toSeq === Seq(("aa", 1), ("zz", 2)))
  }

  test("agrees with a brute-force scala reimplementation on the fixture corpus") {
    val rows = Tables.documents(spark, sf001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val tf = rows.flatMap { case (id, text) =>
      text.toLowerCase.split("[^a-z0-9]+").filter(_.length >= TfIdf.MinLen)
        .groupBy(identity).map { case (w, ws) => ((id, w), ws.length.toLong) }
    }.toMap
    val df = tf.keys.groupBy(_._2).map { case (w, ks) => w -> ks.size.toLong }
    val expect = tf.toSeq
      .map { case ((id, w), t) => (id, w, t, df(w), t * 1000000L / df(w)) }
      .groupBy(_._1)
      .flatMap { case (_, ts) =>
        ts.sortBy(t => (-t._5, t._2)).take(TfIdf.TopK).zipWithIndex
          .map { case ((id, w, t, d, s), i) => (id, w, t, d, s, i + 1) }
      }.toSeq.sortBy(t => (t._1, t._6))
    val got = TfIdf.topTerms(Tables.documents(spark, sf001))
      .orderBy("doc_id", "rn")
      .as[(Long, String, Long, Long, Long, Long)].collect().toSeq
    assert(got === expect)
  }

  test("boilerplate terms: exactly the words whose df clears the floor, " +
    "integer df_bp, and the floor is inclusive") {
    val docs = Seq(
      (1L, "alpha beta gamma"),
      (2L, "alpha beta delta"),
      (3L, "alpha epsilon zz"),
      (4L, "alpha beta zz")
    ).toDF("doc_id", "text")
    // df: alpha 4/4, beta 3/4, zz 2/4, others 1/4 — at pct=50 the floor is
    // inclusive: zz (exactly 50 %) is in, singletons are out
    val out = TfIdf.boilerplateTerms(docs, pct = 50)
      .orderBy(col("df").desc, col("word"))
      .as[(String, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq("alpha", "beta", "zz"))
    assert(out.map(_._4).toSeq === Seq(10000L, 7500L, 5000L))
    assert(out.forall(_._3 === 4L))
    // agrees with brute force on the fixture corpus at the default floor
    val rows = Tables.documents(spark, sf001)
      .select("doc_id", "text").as[(Long, String)].collect()
    val df = rows.flatMap { case (_, text) =>
      text.toLowerCase.split("[^a-z0-9]+")
        .filter(_.length >= TfIdf.MinLen).distinct
    }.groupBy(identity).map { case (w, ws) => w -> ws.length.toLong }
    val n = rows.length.toLong
    val expect = df.filter { case (_, d) => d * 100 >= n * TfIdf.BoilerplateDfPct }
      .map { case (w, d) => (w, d, n, d * 10000L / n) }
      .toSeq.sortBy(t => (-t._2, t._1))
    val got = TfIdf.boilerplateTerms(Tables.documents(spark, sf001))
      .orderBy(col("df").desc, col("word"))
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got === expect)
    assert(got.nonEmpty, "fixture corpus has no boilerplate terms — floor too high")
  }

  test("plan: top-k runs under a WindowGroupLimit (k rows kept pre-shuffle)") {
    val q = TfIdf.topTerms(Tables.documents(spark, sf001))
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("WindowGroupLimit"), plan.take(3000))
  }
}
