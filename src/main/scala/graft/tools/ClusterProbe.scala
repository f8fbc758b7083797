package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}

/** Build probe on a multi-process local-cluster: executors are separate
  * JVMs, the honest sandbox analog of N executors.
  * `runMain graft.tools.ClusterProbe <executors> <coresPerExec> <docs>`.
  */
object ClusterProbe {
  def main(args: Array[String]): Unit = {
    val execs = args(0).toInt
    val cores = args(1).toInt
    val docs = args(2).toLong
    val corpusDir = s"/tmp/graft-probe-corpus-$docs"
    val spark = SparkSession.builder()
      .master(s"local-cluster[$execs,$cores,4096]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.executor.memory", "4g")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.host", "localhost")
      .config("spark.executor.extraClassPath", "/root/repo/target/scala-2.13/classes")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idxDir = Files.createTempDirectory(s"graft-cluster-idx-$execs").toString
    val t0 = System.nanoTime()
    IndexBuilder.build(spark, Corpus.fromCodeDocs(spark.read.parquet(corpusDir)),
      idxDir, IndexConfig(shards = 32, termBuckets = 8))
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"CLUSTER execs=$execs cores=$cores docs=$docs total=$sec%.2f s rate=${docs / sec}%.0f docs/s")
    spark.stop()
  }
}
