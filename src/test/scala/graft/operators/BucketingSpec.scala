package graft.operators

import graft.SparkSpec
import graft.queries.Tables

/** [[Bucketing.ensureBucketed]]'s idempotency contract (VERDICT r5 §next
  * 7): concurrent same-JVM ensures both succeed, and a stale unregistered
  * warehouse location (what a previous JVM's run leaves behind — observed
  * breaking `tpch_q3_bucketed` in a fresh session over a reused repo) is
  * recovered from instead of failing with LOCATION_ALREADY_EXISTS.
  */
class BucketingSpec extends SparkSpec {

  private def warehouseDir(table: String): java.io.File = {
    val warehouse = new java.net.URI(spark.sessionState.conf.warehousePath).getPath
    new java.io.File(warehouse, table.toLowerCase(java.util.Locale.ROOT))
  }

  test("ensureBucketed recovers from a stale unregistered warehouse location") {
    val t = "graft_spec_stale_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    // simulate a previous JVM's leftovers: location exists, catalog empty
    val loc = warehouseDir(t)
    assert(loc.mkdirs())
    java.nio.file.Files.writeString(loc.toPath.resolve("junk"), "stale")
    assert(!spark.catalog.tableExists(t))
    Bucketing.ensureBucketed(spark, t, "o_orderkey", 4)(
      Tables.orders(spark, sf001).select("o_orderkey", "o_orderdate"))
    assert(spark.catalog.tableExists(t))
    assert(spark.table(t).count() === Tables.orders(spark, sf001).count())
    spark.sql(s"DROP TABLE $t")
  }

  test("two concurrent ensureBucketed calls on the same table both succeed") {
    val t = "graft_spec_concurrent_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    val ensure = () =>
      Bucketing.ensureBucketed(spark, t, "o_orderkey", 4)(
        Tables.orders(spark, sf001).select("o_orderkey", "o_custkey"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration._
    val both = Future.sequence(Seq(Future(ensure()), Future(ensure())))
    Await.result(both, 120.seconds)
    assert(spark.catalog.tableExists(t))
    assert(spark.table(t).count() === Tables.orders(spark, sf001).count())
    spark.sql(s"DROP TABLE $t")
  }

  test("ensureBucketed is a no-op when the table already exists (no rewrite)") {
    val t = "graft_spec_noop_bucketed"
    spark.sql(s"DROP TABLE IF EXISTS $t")
    Bucketing.ensureBucketed(spark, t, "o_orderkey", 4)(
      Tables.orders(spark, sf001).select("o_orderkey"))
    val mtime = warehouseDir(t).lastModified
    Bucketing.ensureBucketed(spark, t, "o_orderkey", 4)(
      sys.error("df thunk must not be forced when the table exists"))
    assert(warehouseDir(t).lastModified === mtime)
    spark.sql(s"DROP TABLE $t")
  }
}
