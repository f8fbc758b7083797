package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig, Manifest}

/** Build (or resume) an index into a FIXED directory — the kill/resume
  * harness target. `runMain graft.tools.BuildTo <corpusDir> <idxDir> [cpus]`.
  */
object BuildTo {
  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val idxDir = args(1)
    val cpus = if (args.length > 2) args(2).toInt else 16
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(s"BUILDTO start committed=${Manifest.committed(idxDir).size}")
    val t0 = System.nanoTime()
    IndexBuilder.build(spark, Corpus.fromCodeDocs(spark.read.parquet(corpusDir)),
      idxDir, IndexConfig(shards = 32, termBuckets = 8))
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"BUILDTO done secs=$secs%.3f committed=${Manifest.committed(idxDir).size} totals=${Manifest.totals(idxDir)}")
    spark.stop()
  }
}
