package graft.text

import graft.SparkSpec

class QualityModelSpec extends SparkSpec {

  /** Independent reimplementation of the scorer's weight lookup: md5 via
    * MessageDigest (not Spark functions), first 15 hex chars as base-16,
    * mod 1001 minus 500.
    */
  private def weight(feature: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(("q:" + feature).getBytes("UTF-8"))
    val hex = d.map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16) % TextAnalysis.WeightMod - (TextAnalysis.WeightMod - 1) / 2
  }

  test("hand-golden: two-word doc scores the sum of its three feature weights") {
    import spark.implicits._
    val docs = Seq((1L, "the cat")).toDF("doc_id", "text")
    val row = TextAnalysis.qualityModel(docs).collect().head
    val expRaw = weight("the") + weight("cat") + weight("the cat")
    assert(row.getLong(1) === 3L, "n_feats: uni the, cat + bi 'the cat'")
    assert(row.getLong(2) === expRaw)
    assert(row.getDouble(3) === expRaw.toDouble / 3)
    assert(row.getString(4) === (if (expRaw >= 0) "keep" else "drop"))
  }

  test("edge docs: empty text is feature-less; all-punct text scores one boundary bigram") {
    import spark.implicits._
    val docs = Seq((1L, "the cat"), (2L, "!!!"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityModel(docs).orderBy("doc_id").collect()
    assert(out.length === 3)
    // "!!!" splits to ["", ""] → no unigrams survive the nonempty filter,
    // but the 2-element raw array DOES form one bigram "" + " " + "" = " "
    // (explodeShingles keeps boundary empties — same as the n-gram dedup
    // family); the doc therefore scores that single bigram feature
    assert(out(1).getLong(1) === 1L)
    assert(out(1).getLong(2) === weight(" "))
    // "" splits to [""]: no unigram, array too short for a bigram →
    // feature-less, score 0, label keep
    assert(out(2).getLong(1) === 0L)
    assert(out(2).getLong(2) === 0L)
    assert(out(2).getDouble(3) === 0.0)
    assert(out(2).getString(4) === "keep")
  }

  /** [[weight]]'s twin for the saved-table variant: bucket the feature
    * hash, then derive the bucket's weight the way [[TextAnalysis.weightTable]]
    * does ("qw:" salt over the bucket index).
    */
  private def hash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map(b => f"$b%02x").mkString.take(15), 16)
  }
  private def savedWeight(feature: String): Long = {
    val bucket = hash60("q:" + feature) % TextAnalysis.WeightBuckets
    hash60("qw:" + bucket) % TextAnalysis.WeightMod - (TextAnalysis.WeightMod - 1) / 2
  }

  test("saved weights round-trip: the persisted parquet equals weightTable") {
    val path = TextAnalysis.ensureSavedWeights(spark)
    val reloaded = spark.read.parquet(path)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1)))
    val direct = TextAnalysis.weightTable(spark)
      .orderBy("bucket").collect().map(r => (r.getInt(0), r.getLong(1)))
    assert(reloaded.length === TextAnalysis.WeightBuckets)
    assert(reloaded.toSeq === direct.toSeq)
    // and the table really is the deterministic derivation the oracle replays
    reloaded.take(64).foreach { case (b, w) =>
      assert(w === hash60("qw:" + b) % TextAnalysis.WeightMod
        - (TextAnalysis.WeightMod - 1) / 2)
    }
  }

  test("qualityModelSaved scores through the artifact exactly as the " +
    "independent bucket-weight reimplementation") {
    import spark.implicits._
    val docs = Seq((1L, "the cat"), (2L, "sat on the mat"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.qualityModelSaved(spark, docs).orderBy("doc_id").collect()
    val expRaw1 = savedWeight("the") + savedWeight("cat") + savedWeight("the cat")
    assert(out(0).getLong(1) === 3L)
    assert(out(0).getLong(2) === expRaw1)
    assert(out(2).getLong(1) === 0L) // feature-less doc keeps its spine row
  }

  test("saved variant keeps the identical plan shape (no extra join, same " +
    "explode + partial agg pipeline)") {
    import graft.queries.Tables
    def ops(df: org.apache.spark.sql.DataFrame): Seq[String] = {
      df.collect()
      df.queryExecution.executedPlan.toString.linesIterator
        .map(_.dropWhile(c => !c.isLetter && c != '*'))
        .map(_.replaceAll("^\\*?\\(\\d+\\) ", "").takeWhile(_.isLetter))
        .filter(_.nonEmpty)
        .toSeq
    }
    val docs = Tables.documents(spark, sf001)
    val baseOps = ops(TextAnalysis.qualityModel(docs))
    val savedOps = ops(TextAnalysis.qualityModelSaved(spark, docs))
    // operator-for-operator identical: the weight lookup is a scalar
    // expression swap, invisible at plan-node granularity
    assert(savedOps === baseOps, s"base:\n$baseOps\nsaved:\n$savedOps")
  }

  test("both labels are reachable with single-token docs") {
    import spark.implicits._
    // scan a small candidate vocabulary for one positive- and one
    // negative-weight token (weights are ~uniform on [-500, 500], so a few
    // dozen candidates always contain both); a single-token doc has ONLY
    // its unigram feature (1-element array → no bigram)
    val cands = ('a' to 'z').map(c => s"tok$c")
    val posTok = cands.find(t => weight(t) >= 0).get
    val negTok = cands.find(t => weight(t) < 0).get
    val docs = Seq((1L, posTok), (2L, negTok)).toDF("doc_id", "text")
    val out = TextAnalysis.qualityModel(docs).orderBy("doc_id").collect()
    assert(out(0).getString(4) === "keep")
    assert(out(1).getString(4) === "drop")
    assert(out(0).getLong(1) === 1L)
  }
}
