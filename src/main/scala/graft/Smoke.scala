package graft

import org.apache.spark.sql.SparkSession

/** Smoke driver: runs the flagship [[SparkEntry.entry]] plus a degenerate
  * (all-stopword) query, printing row counts — the quickest end-to-end
  * drive of the engine surface. Usage: `sbt "runMain graft.Smoke"`.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val e = SparkEntry.entry(spark)
    println("ENTRY_ROWS=" + e.count())
    e.show(5, truncate = false)
    val deg = search.RelationalBM25.topK(
      corpus.Corpus.documents(spark, "/root/testdata/sf0.001"),
      "the a of", 10, stem = false)
    println("DEGEN_ROWS=" + deg.count())
    spark.stop()
  }
}
