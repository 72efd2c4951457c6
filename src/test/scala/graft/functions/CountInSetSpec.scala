package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The native codegen'd set-probe count must be value-identical to the HOF
  * filter spelling it replaced (property-checked end-to-end through the
  * codegen path against a plain-Scala reference), count occurrences with
  * multiplicity, propagate nulls, and run inside whole-stage codegen.
  */
class CountInSetSpec extends SparkSpec {
  import spark.implicits._

  private val vocabGen = Gen.listOf(Gen.oneOf("the", "a", "der", "le", "", "zz", "und"))

  test("property: equals the multiplicity count of a plain-Scala reference") {
    val set = Seq("the", "der", "le", "und")
    val prop = Prop.forAll(Gen.listOf(vocabGen)) { (docs: List[List[String]]) =>
      val df = docs.map(d => Tuple1(d)).toDF("w")
      val out = df.select(CountInSet.countInSet(col("w"), set).as("c"))
        .collect().map(_.getLong(0)).toList
      out == docs.map(_.count(set.contains))
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("multiplicity, misses, empty set member, null array (codegen path)") {
    val df = Seq(
      (Some(Seq("the", "x", "the", "und")), 0),
      (Some(Seq("y", "z")), 1),
      (Some(Seq("", "a", "")), 2),
      (None: Option[Seq[String]], 3)
    ).toDF("w", "i").orderBy("i")
    val out = df.select(CountInSet.countInSet(col("w"), Seq("the", "und")).as("c")).collect()
    assert(out(0).getLong(0) === 3L) // two "the" + one "und" — multiplicity
    assert(out(1).getLong(0) === 0L)
    assert(out(3).isNullAt(0))
    // the empty string is an honest set member (the n_words spelling
    // counts size − empty-hits)
    val empties = df.select(CountInSet.countInSet(col("w"), Seq("")).as("c")).collect()
    assert(empties(2).getLong(0) === 2L)
  }

  test("equals the interpreted HOF filter spelling on the real corpus") {
    val markers = graft.text.TextAnalysis.Markers.head._2
    val docs = graft.queries.Tables.documents(spark, sf001).limit(200)
      .select(col("doc_id"), graft.dedup.Hashing.words(col("text")).as("w"))
    val mismatches = docs.select(
      CountInSet.countInSet(col("w"), markers).as("native"),
      size(filter(col("w"),
        t => markers.map(m => t === m).reduce[org.apache.spark.sql.Column](_ || _)))
        .cast("long").as("hof"))
      .filter(col("native") =!= col("hof"))
    assert(mismatches.isEmpty)
  }

  test("runs inside whole-stage codegen (the point of the native expression)") {
    val df = spark.range(100)
      .select(array(concat(lit("w"), col("id") % 3)).as("w"))
      .select(CountInSet.countInSet(col("w"), Seq("w0", "w2")).as("c"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(_.contains("count_in_set")), plan.take(2000))
    assert(plan.contains("*("), plan.take(2000))
  }
}
