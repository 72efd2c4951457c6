object TimeSub9 extends App {
  import org.apache.spark.sql.functions._
  val spark = graft.GraftSession.builder("local[8]", "8").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val dir = "/root/testdata/sf0.1"
  val delta = graft.dedup.IncrementalDedup.deltaCorpus(graft.queries.Tables.documents(spark, dir))
    .localCheckpoint(false)
  delta.count()
  import graft.functions.{BloomFilter, GramHashes}
  val big = Array.fill(262144)(-1L)
  val c = BloomFilter.cutPositions(GramHashes.gramHashes(col("text")), big, 7)
  println("[t] START " + java.lang.ProcessHandle.current().pid())
  (1 to 100).foreach(_ => delta.select(sum(size(c))).head())
  println("[t] DONE")
  spark.stop()
}
