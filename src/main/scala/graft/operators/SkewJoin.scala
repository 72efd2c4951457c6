package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the JOIN-side companion to
  * [[SaltedAggregate]].
  *
  * A hash join on a skewed key sends every row of the hot key to one
  * reducer; one task drags the stage. Salting splits the hot keys: the
  * BIG side gets a uniform salt in [0, buckets); the SMALL side is
  * replicated once per salt value (explode of a literal range — cheap,
  * it's the small side), and the join key becomes (key, salt). Every
  * bucket of a hot key lands on a different reducer. Exact for equi-joins;
  * cost = small-side ×buckets replication.
  *
  * AQE's skew-join handling does this adaptively for SORT-MERGE joins at
  * runtime; explicit salting still matters when the skew is in an
  * aggregation-feeding join AQE can't split or when deterministic task
  * sizing is required. The salt is `monotonically_increasing_id % buckets`
  * — uniform spread even over byte-identical duplicate rows (a content
  * hash would collapse them onto one bucket, exactly the hot rows that
  * need spreading). The expression is nondeterministic (values depend on
  * partition layout), which is SAFE here on both axes: the join RESULT is
  * salt-assignment-independent (the small side carries every (key, salt)
  * pair, so any salt finds its match), and a stage retry cannot mix two
  * assignments because Spark marks nondeterministic stages INDETERMINATE
  * and rolls back/recomputes them whole (the SPARK-23207 contract) rather
  * than patching individual map outputs.
  */
object SkewJoin {

  val DefaultBuckets = 16

  /** `big ⋈ small ON key`, salted `buckets` ways. Output columns: all of
    * `big`'s then `small`'s (minus its join key), like a plain inner join.
    */
  def saltedJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      buckets: Int = DefaultBuckets): DataFrame = {
    val saltedBig = big
      .withColumn("__salt", (monotonically_increasing_id() % buckets).cast("int"))
    val replicatedSmall = small
      .withColumn("__salt", explode(array((0 until buckets).map(lit): _*)))
    saltedBig
      .join(replicatedSmall, Seq(key, "__salt"))
      .drop("__salt")
  }
}
