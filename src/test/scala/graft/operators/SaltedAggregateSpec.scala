package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.queries.Tables

class SaltedAggregateSpec extends SparkSpec {
  import spark.implicits._

  test("salted sum/count equals the plain aggregate exactly") {
    val events = Tables.events(spark, sf001)
    val plain = events.groupBy(col("event_type"))
      .agg(sum(col("value")).as("sum_value"), count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    val salted = SaltedAggregate.sumCount(events, "event_type", "value")
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getLong(2))).toMap
    assert(salted.keySet === plain.keySet)
    salted.foreach { case (k, (s, c)) =>
      assert(c === plain(k)._2)
      assert(math.abs(s - plain(k)._1) < 1e-6 * math.abs(plain(k)._1))
    }
  }

  test("salted join equals the plain join on skewed data, hot key fanned out") {
    // 10k rows of one hot key + a tail, joined to a small dimension
    val big = ((1 to 10000).map(i => ("hot", i.toLong)) ++
      (1 to 50).map(i => (s"k$i", i.toLong))).toDF("k", "v")
    val dim = (Seq("hot") ++ (1 to 50).map(i => s"k$i")).zipWithIndex
      .map { case (k, i) => (k, s"label$i") }.toDF("k", "lbl")
    val plain = big.join(dim, "k")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    val salted = SkewJoin.saltedJoin(big, dim, "k", buckets = 8)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(salted === plain)
    assert(salted.size === 10050)
  }

  test("degenerate single-key input (the skew case) still aggregates correctly") {
    val skewed = (1 to 10000).map(i => ("hot", i.toLong)).toDF("k", "v")
    val out = SaltedAggregate.sumCount(skewed, "k", "v", buckets = 8).head()
    assert(out.getString(0) === "hot")
    assert(out.getLong(1) === (1 to 10000).map(_.toLong).sum)
    assert(out.getLong(2) === 10000L)
    // and the first stage genuinely fans the hot key out across salts
    val firstStage = skewed
      .withColumn("__salt", (monotonically_increasing_id() % 8).cast("int"))
      .groupBy("k", "__salt").count()
    assert(firstStage.count() > 1)
  }
}
