package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.SparkSpec

/** The native codegen'd shingle kernel must be value-identical to the
  * sliding-window join of a plain-Scala reference (property-checked
  * through the codegen path), honor the shorter-than-k and null contracts,
  * and run inside whole-stage codegen.
  */
class WordShinglesSpec extends SparkSpec {
  import spark.implicits._

  test("property: equals sliding(k).map(mkString) for k in 1..4") {
    val tokGen = Gen.listOf(Gen.oneOf("a", "bb", "ccc", "", "dd"))
    val prop = Prop.forAll(Gen.listOf(tokGen), Gen.choose(1, 4)) {
      (docs: List[List[String]], k: Int) =>
        val df = docs.map(d => Tuple1(d)).toDF("w")
        val out = df.select(WordShingles.wordShingles(col("w"), k).as("s"))
          .collect().map(_.getSeq[String](0).toList).toList
        val ref = docs.map { d =>
          if (d.size < k) Nil else d.sliding(k).map(_.mkString(" ")).toList
        }
        out == ref
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(30), prop)
    assert(res.passed, res.status.toString)
  }

  test("shorter-than-k yields empty, null array yields null (codegen path)") {
    val df = Seq(
      (Some(Seq("a", "b", "c")), 0),
      (Some(Seq("a")), 1),
      (Some(Seq.empty[String]), 2),
      (None: Option[Seq[String]], 3)
    ).toDF("w", "i").orderBy("i")
    val out = df.select(WordShingles.wordShingles(col("w"), 2).as("s")).collect()
    assert(out(0).getSeq[String](0) === Seq("a b", "b c"))
    assert(out(1).getSeq[String](0) === Seq.empty[String])
    assert(out(2).getSeq[String](0) === Seq.empty[String])
    assert(out(3).isNullAt(0))
  }

  test("equals the HOF transform/slice/array_join spelling on the real corpus") {
    val docs = graft.queries.Tables.documents(spark, sf001).limit(200)
      .select(col("doc_id"), graft.dedup.Hashing.words(col("text")).as("w"))
    val hof = when(size(col("w")) < 2, array().cast("array<string>"))
      .otherwise(transform(
        sequence(lit(0), size(col("w")) - 2),
        i => array_join(slice(col("w"), i + lit(1), lit(2)), " ")))
    val mismatches = docs.select(
      WordShingles.wordShingles(col("w"), 2).as("native"), hof.as("hof"))
      .filter(not(col("native") <=> col("hof")))
    assert(mismatches.isEmpty)
  }

  test("runs inside whole-stage codegen (the point of the native expression)") {
    val df = spark.range(100)
      .select(array(lit("a"), concat(lit("w"), col("id")), lit("b")).as("w"))
      .select(WordShingles.wordShingles(col("w"), 2).as("s"))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(_.contains("word_shingles")), plan.take(2000))
    assert(plan.contains("*("), plan.take(2000))
  }
}
