package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.dedup.Hashing

/** Deterministic k-per-group example sampling — "show me k examples from
  * every stratum": the debugging/eyeballing query every data engineer
  * runs, made REPRODUCIBLE by ranking on a salted md5 hash of the row's
  * unit instead of `rand()` (same examples on every run, every
  * partitioning, and in the DuckDB oracle — `LIMIT k` per group with
  * `rand()` can never hash-gate).
  *
  * Scale shape: one hash projection (scan-fused) + one group-keyed
  * row_number window that Catalyst executes with a pre-shuffle
  * WindowGroupLimit — each map partition forwards at most k rows per
  * group, so the exchange is bounded by groups × k × partitions, and
  * result size by groups × k. A giant group costs what a small one does.
  */
object GroupSample {

  val Salt = "gs:"

  /** The k hash-smallest rows of each group. Output: the requested
    * `carry` columns plus `rk` (1-based rank within the group).
    *
    * PRECONDITION (the [[RangeRank]] convention): `unit` must be unique
    * within each group. The rank's total order is (hash, unit); rows
    * tying on both leave `row_number` to break the tie by physical row
    * order — which rows survive a tie straddling rank k, and which carry
    * values ride, would then vary across runs/partitionings and diverge
    * from the oracle's own arbitrary tie pick. With a unique unit the
    * order is total and the sample reproducible everywhere.
    */
  def examples(
      df: DataFrame, group: Column, unit: Column, k: Int,
      carry: Seq[String]): DataFrame = {
    val h = Hashing.hash60(concat(lit(Salt), unit.cast("string")))
    val w = Window.partitionBy("__grp").orderBy(col("__h"), col("__u"))
    df
      .select(Seq(group.as("__grp"), h.as("__h"), unit.cast("string").as("__u")) ++
        carry.map(col): _*)
      .withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= k)
      .select(col("__grp").as("grp") +: carry.map(col) :+ col("rk"): _*)
      .orderBy("grp", "rk")
  }

  /** DuckDB oracle over a (group, unit, carry...) projection. */
  def examplesOracleSql(
      fromSql: String, groupCol: String, unitExpr: String, k: Int,
      carryCols: Seq[String]): String = {
    val hash = Hashing.hash60Sql(s"'$Salt' || $unitExpr")
    val carries = carryCols.mkString(", ")
    s"""WITH r AS (
       |  SELECT $groupCol AS grp, $carries,
       |         CAST(row_number() OVER (PARTITION BY $groupCol
       |                                 ORDER BY $hash, $unitExpr) AS BIGINT) AS rk
       |  FROM ($fromSql)
       |)
       |SELECT grp, $carries, rk FROM r WHERE rk <= $k
       |ORDER BY grp, rk""".stripMargin
  }
}
