package graft.text

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class FrequencySpectrumSpec extends SparkSpec {
  import spark.implicits._

  test("closed form: known token multiplicities land in the right spectrum buckets") {
    // "a" x3, "b" x2, "c" x1, "d" x1  =>  freq 1 -> 2 types, 2 -> 1, 3 -> 1
    val docs = Seq("a b a", "a b c", "d").map(t => (1L, t)).toDF("doc_id", "text")
    val got = FrequencySpectrum.spectrum(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L, 2L -> 1L, 3L -> 1L))
  }

  test("mass identity on the live corpus: sum(freq * n_types) = total token count") {
    assumeTestdata(sf001)
    val docs = Tables.documents(spark, sf001)
    // collect ONCE; the mass aggregate is local arithmetic over the
    // bounded spectrum rows (review r15: a second spectrum() call re-ran
    // the whole two-shuffle corpus aggregation)
    val rows = FrequencySpectrum.spectrum(docs).collect()
    val total = docs
      .select(explode(graft.dedup.Hashing.words(col("text"))).as("w"))
      .filter(col("w") =!= "").count()
    assert(rows.map(r => r.getLong(0) * r.getLong(1)).sum === total)
    // spectrum is non-empty and every bucket is positive (the synthetic
    // fixture's fixed vocabulary has NO singletons — a natural-corpus
    // Zipf head claim would be fixture-dependent, so only invariants)
    assert(rows.nonEmpty && rows.forall(r => r.getLong(0) >= 1 && r.getLong(1) >= 1))
  }
}
