package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed tables: pre-shuffled physical layout for exchange-free joins.
  *
  * A big-fact ⋈ big-fact equi-join normally shuffles BOTH sides on the key
  * every time it runs. Writing each side `bucketBy(n, key)` hash-
  * partitions the files ONCE at write time; every later join on that key
  * reads co-located buckets and the plan contains NO Exchange — at 100 TB
  * that converts the dominant recurring shuffle into a one-time layout
  * cost. This is the batch twin of the streaming state-store layout and
  * the standard companion to AQE (which can only optimize the shuffles
  * that still exist).
  *
  * Bucketed tables must live in the session catalog (bucket metadata has
  * no directory encoding), hence `saveAsTable`, not `parquet(path)`.
  * BucketingSpec pins the exchange-free join plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .saveAsTable(table)

  /** Idempotent [[writeBucketed]]: after this returns, `table` exists in
    * the session catalog. Safe against the two failure modes a bare
    * check-then-write has (VERDICT r5 §next 7):
    *
    *  - SAME-JVM concurrency: two threads ensuring the same table — the
    *    whole ensure is serialized on a per-process lock, the loser sees
    *    `tableExists` and returns.
    *  - CROSS-JVM staleness: a previous process left the managed-table
    *    LOCATION in the shared warehouse but this process's in-memory
    *    catalog has no entry, so CREATE fails with
    *    LOCATION_ALREADY_EXISTS. An unregistered location is an artifact
    *    of unknown provenance (no catalog row ⇒ no bucket-spec metadata to
    *    trust) — delete it and rewrite.
    *
    * A concurrent writer in ANOTHER JVM between the delete and the write
    * still surfaces as LOCATION_ALREADY_EXISTS; that race is retried once
    * against the re-checked state and then failed loudly — with an
    * in-memory catalog per process there is no shared metadata to
    * arbitrate further (a production deployment shares a real metastore,
    * whose CREATE is atomic).
    */
  def ensureBucketed(
      spark: SparkSession,
      table: String,
      key: String,
      buckets: Int)(df: => DataFrame): Unit = ensureLock.synchronized {
    def staleLocation(): java.io.File = {
      val warehouse = new java.net.URI(
        spark.sessionState.conf.warehousePath).getPath
      new java.io.File(warehouse, table.toLowerCase(java.util.Locale.ROOT))
    }
    def deleteRecursively(f: java.io.File): Unit = {
      // listFiles() is null on I/O error or if the dir vanished between
      // the isDirectory check and the call — the vanished case is the
      // state we wanted anyway, so treat null as empty
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
        .foreach(deleteRecursively)
      f.delete(): Unit
    }
    // a pre-existing table only counts if its bucket SPEC matches the
    // request — reusing a table bucketed on another key or count would
    // silently regain the exchange (or mis-co-locate) the operator exists
    // to eliminate; a digest-keyed name pins content, not layout
    def specMatches(): Boolean = {
      val meta = spark.sessionState.catalog.getTableMetadata(
        org.apache.spark.sql.catalyst.TableIdentifier(table))
      meta.bucketSpec.exists(bs =>
        bs.numBuckets == buckets &&
          bs.bucketColumnNames.map(_.toLowerCase(java.util.Locale.ROOT)) ==
            Seq(key.toLowerCase(java.util.Locale.ROOT)))
    }
    if (spark.catalog.tableExists(table) && !specMatches()) {
      System.err.println(
        s"Bucketing.ensureBucketed: $table exists with a different bucket " +
          s"spec — dropping and rewriting as ($key, $buckets)")
      spark.sql(s"DROP TABLE `$table`")
    }
    var attempts = 0
    while (!spark.catalog.tableExists(table)) {
      attempts += 1
      if (attempts > 2)
        throw new IllegalStateException(
          s"Bucketing.ensureBucketed: $table still absent after $attempts attempts")
      val loc = staleLocation()
      if (loc.exists()) deleteRecursively(loc)
      try writeBucketed(df, table, key, buckets)
      catch {
        case e: org.apache.spark.sql.AnalysisException if attempts < 2 =>
          System.err.println(s"Bucketing.ensureBucketed: retrying $table after ${e.getErrorClass}")
      }
    }
  }

  private val ensureLock = new Object

  /** Join two same-bucketed tables on their bucket key — no exchange. */
  def bucketedJoin(spark: SparkSession, left: String, right: String, key: String): DataFrame =
    spark.table(left).join(spark.table(right), key)
}
