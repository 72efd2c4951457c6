package graft

import org.apache.spark.sql.catalyst.expressions.Literal
import org.apache.spark.sql.types.{ArrayType, LongType}
import org.scalacheck.{Prop, Test => SCTest}

import graft.functions.DotProductQ
import graft.text.TextAnalysis

/** Property-style pins against independent plain-Scala references —
  * implementations that share NO code with the engine paths they check.
  */
class PropertySpec extends SparkSpec {

  test("dot_product_q eval equals the Scala reference on arbitrary long arrays") {
    val prop = Prop.forAll { (a: List[Long], b: List[Long]) =>
      val expr = DotProductQ(
        Literal.create(a, ArrayType(LongType)),
        Literal.create(b, ArrayType(LongType)))
      val expected = a.zip(b).map { case (x, y) => x * y }.sum
      expr.eval(null) == expected
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(res.passed, res.status.toString)
  }

  test("dot_product_q propagates null for null inputs") {
    val n = Literal.create(null, ArrayType(LongType))
    val v = Literal.create(Seq(1L, 2L), ArrayType(LongType))
    assert(DotProductQ(n, v).eval(null) == null)
    assert(DotProductQ(v, n).eval(null) == null)
  }

  test("winnowing fingerprints match a direct Scala reference on random ASCII docs") {
    import spark.implicits._
    val G = TextAnalysis.GramLen
    val W = TextAnalysis.WinnowWindow
    val M = TextAnalysis.PolyMod
    val pow = (0 until G).scanLeft(1L)((acc, _) => acc * TextAnalysis.PolyBase % M)

    val rng = new scala.util.Random(7)
    val docs = (0 until 150).map { i =>
      val len = rng.nextInt(60) // includes lengths below G+W-1 → excluded docs
      (i.toLong, (0 until len).map(_ => (32 + rng.nextInt(95)).toChar).mkString)
    }

    // independent reference: per doc, gram hashes → sliding window minima →
    // (#distinct, min)
    val expected = docs.flatMap { case (id, s) =>
      if (s.length < G + W - 1) None
      else {
        val hashes = (0 to s.length - G).map { i =>
          (0 until G).map(j => s(i + j).toLong * pow(G - 1 - j)).sum % M
        }
        val wmins = (0 to hashes.length - W).map(p => hashes.slice(p, p + W).min)
        Some(id -> ((wmins.distinct.size.toLong, wmins.min)))
      }
    }.toMap

    val got = TextAnalysis.fingerprints(docs.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got === expected)
    assert(expected.nonEmpty && expected.size < docs.size) // short docs really excluded
  }
}
