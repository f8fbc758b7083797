package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.Udfs

/** Isolates scaling of the three primitive costs: UDF scan, shuffle agg,
  * parquet write. `runMain graft.tools.MicroProbe <cpus>`.
  */
object MicroProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val corpusDir = "/tmp/graft-probe-corpus-100000"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed(name: String)(f: => Any): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"MICRO cpus=$cpus $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = spark.read.parquet(corpusDir)
    timed("warm-scan")(docs.count())
    timed("udf-scan")(docs.select(explode(Udfs.analyze(col("content"))).as("t")).count())
    timed("udf-scan2")(docs.select(explode(Udfs.analyze(col("content"))).as("t")).count())
    timed("shuffle-agg")(docs.select(col("repo"), explode(Udfs.analyze(col("content"))).as("t"))
      .groupBy("repo", "t").count().count())
    timed("write")(docs.write.mode("overwrite").parquet("/tmp/graft-micro-out"))
    spark.stop()
  }
}
