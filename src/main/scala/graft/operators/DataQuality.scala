package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.queries.Tables

/** Declarative data-quality validation (the Deequ-shaped report): a fixed
  * constraint suite over the warehouse tables, one row per check —
  * (tbl, chk, col, total, violations, pass) — with every metric an exact
  * integer so the report itself hash-gates.
  *
  * Scale design (100 TB): all single-column checks on a table fold into
  * ONE aggregate projection over ONE scan (events carries three checks in
  * one pass — spec-pinned single scan); uniqueness is a two-level
  * partial-agg'd aggregate (the shuffle carries distinct keys only);
  * referential integrity is a LEFT-ANTI count with the dimension side
  * broadcast. Nothing collects, nothing scans twice for the same check
  * family, and the report is O(#checks) rows regardless of table size.
  *
  * The suite deliberately mixes passing and failing checks on the live
  * fixture (membership catches the 'error' event rows; the l_discount
  * bound catches ~45 % of lineitem) so the report shape is exercised in
  * both directions, not a vacuous all-green.
  */
object DataQuality {

  val AllowedEventTypes: Seq[String] = Seq("click", "view", "purchase", "signup")

  /** The declared suite over events, lineitem, orders, customer. */
  def report(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.read(spark, dir, "orders")
    val cust = Tables.read(spark, dir, "customer")

    // three checks, one events scan: a single aggregate projection
    val evRows = ev
      .agg(
        count(lit(1)).as("total"),
        sum(when(!col("event_type").isin(AllowedEventTypes: _*), 1L).otherwise(0L))
          .as("v_member"),
        sum(when(col("user_id").isNull, 1L).otherwise(0L)).as("v_null"),
        sum(when(col("value") < 0.0, 1L).otherwise(0L)).as("v_range"))
      .selectExpr(
        s"""stack(3,
           |  'events', 'membership',   'event_type', total, v_member,
           |  'events', 'completeness', 'user_id',    total, v_null,
           |  'events', 'range_nonneg', 'value',      total, v_range)
           |AS (tbl, chk, col, total, violations)""".stripMargin)

    // two checks, one lineitem scan
    val liRows = li
      .agg(
        count(lit(1)).as("total"),
        sum(when(col("l_discount") > 0.05, 1L).otherwise(0L)).as("v_disc"),
        sum(when(!col("l_quantity").between(1, 50), 1L).otherwise(0L)).as("v_qty"))
      .selectExpr(
        s"""stack(2,
           |  'lineitem', 'range_max_5pct', 'l_discount', total, v_disc,
           |  'lineitem', 'range_1_50',     'l_quantity', total, v_qty)
           |AS (tbl, chk, col, total, violations)""".stripMargin)

    // key uniqueness: violations = rows − distinct keys, two-level agg
    val ordRows = ord
      .groupBy("o_orderkey").agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).as("total"), (sum(col("c")) - count(lit(1))).as("violations"))
      .select(
        lit("orders").as("tbl"), lit("unique").as("chk"),
        lit("o_orderkey").as("col"), col("total"), col("violations"))

    // referential integrity: every event user exists as a customer
    val riRows = ev.select(col("user_id"))
      .join(
        broadcast(cust.select(col("c_custkey").as("user_id"))),
        Seq("user_id"), "left_anti")
      .agg(count(lit(1)).as("violations"))
      .crossJoin(ev.agg(count(lit(1)).as("total")))
      .select(
        lit("events").as("tbl"), lit("ref_integrity").as("chk"),
        lit("user_id").as("col"), col("total"), col("violations"))

    evRows.unionAll(liRows).unionAll(ordRows).unionAll(riRows)
      .withColumn("pass", (col("violations") === 0L).cast("int"))
  }

  def reportOracleSql: String = {
    val typesIn = AllowedEventTypes.map(t => s"'$t'").mkString(", ")
    s"""WITH ev AS (
       |  SELECT CAST(count(*) AS BIGINT) AS total,
       |         CAST(sum(CASE WHEN event_type NOT IN ($typesIn) THEN 1 ELSE 0 END) AS BIGINT) AS v_member,
       |         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS v_null,
       |         CAST(sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END) AS BIGINT) AS v_range
       |  FROM events
       |), li AS (
       |  SELECT CAST(count(*) AS BIGINT) AS total,
       |         CAST(sum(CASE WHEN l_discount > 0.05 THEN 1 ELSE 0 END) AS BIGINT) AS v_disc,
       |         CAST(sum(CASE WHEN l_quantity NOT BETWEEN 1 AND 50 THEN 1 ELSE 0 END) AS BIGINT) AS v_qty
       |  FROM lineitem
       |), ord AS (
       |  SELECT CAST(count(*) AS BIGINT) AS total,
       |         CAST(count(*) - count(DISTINCT o_orderkey) AS BIGINT) AS violations
       |  FROM orders
       |), ri AS (
       |  SELECT (SELECT CAST(count(*) AS BIGINT) FROM events) AS total,
       |         (SELECT CAST(count(*) AS BIGINT) FROM events e
       |          WHERE NOT EXISTS (SELECT 1 FROM customer c
       |                            WHERE c.c_custkey = e.user_id)) AS violations
       |)
       |SELECT tbl, chk, col, total, violations,
       |       CASE WHEN violations = 0 THEN 1 ELSE 0 END AS pass
       |FROM (
       |  SELECT 'events' AS tbl, 'membership' AS chk, 'event_type' AS col,
       |         total, v_member AS violations FROM ev
       |  UNION ALL SELECT 'events', 'completeness', 'user_id', total, v_null FROM ev
       |  UNION ALL SELECT 'events', 'range_nonneg', 'value', total, v_range FROM ev
       |  UNION ALL SELECT 'lineitem', 'range_max_5pct', 'l_discount', total, v_disc FROM li
       |  UNION ALL SELECT 'lineitem', 'range_1_50', 'l_quantity', total, v_qty FROM li
       |  UNION ALL SELECT 'orders', 'unique', 'o_orderkey', total, violations FROM ord
       |  UNION ALL SELECT 'events', 'ref_integrity', 'user_id', total, violations FROM ri
       |)
       |ORDER BY tbl, chk, col""".stripMargin
  }
}
