package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.corpus.{Corpus, SyntheticCorpus}
import graft.index.{IndexBuilder, IndexConfig}

/** Build-only scaling probe: `runMain graft.tools.ScalingProbe <cpus> <docs>`.
  * Generates (once, cached on disk) the deterministic synthetic corpus and
  * times a full index build at local[cpus] with per-stage timings
  * (GRAFT_TIMINGS=1).
  */
object ScalingProbe {
  def main(args: Array[String]): Unit = {
    val cpus = args(0).toInt
    val docs = args(1).toLong
    val corpusDir = s"/tmp/graft-probe-corpus-$docs-v${sys.env.getOrElse("GRAFT_VOCAB_SPREAD", "0")}"
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", sys.env.getOrElse("GRAFT_SHUFFLE_PARTS", "64"))
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.storage.memoryMapThreshold", "2g")
      .config("spark.hadoop.fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
      .config("spark.local.dir", "/dev/shm/graft-spark")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    if (!Files.exists(Paths.get(corpusDir, "_SUCCESS"))) {
      SyntheticCorpus.generate(spark, docs, 42L, 160, 480,
        sys.env.getOrElse("GRAFT_VOCAB_SPREAD", "0").toInt).repartition(256).write.mode("overwrite").parquet(corpusDir)
    }
    val idxDir = Files.createTempDirectory(s"graft-probe-idx-$cpus").toString
    val t0 = System.nanoTime()
    IndexBuilder.build(spark, Corpus.fromCodeDocs(spark.read.parquet(corpusDir)),
      idxDir, IndexConfig(shards = 32, termBuckets = 8))
    val sec = (System.nanoTime() - t0) / 1e9
    val osBean = java.lang.management.ManagementFactory.getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]
    val cpuSec = osBean.getProcessCpuTime / 1e9
    val gcMs = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .stream.mapToLong(_.getCollectionTime).sum
    val stat = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("/proc/self/stat"))).split(" ")
    val hz = 100.0
    val ut = stat(13).toLong / hz
    val st = stat(14).toLong / hz
    println(f"PROBE cpus=$cpus docs=$docs total=$sec%.2f s rate=${docs / sec}%.0f docs/s cpu=$cpuSec%.1f s usr=$ut%.1f sys=$st%.1f gc=${gcMs / 1000.0}%.1f s")
    spark.stop()
  }
}
