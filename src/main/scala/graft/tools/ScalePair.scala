package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}

/** The bench's two-parallelism-level scaling measurement in ONE child JVM
  * (`runMain graft.tools.ScalePair <corpusDir> <outBase> <budgetSec> [warmFrac]`):
  *
  *   1. boot + Spark session + untimed 1/warmFrac warm-up build — paid ONCE
  *      (a separate child per level pays JVM boot, session init and JIT
  *      twice, and that overhead dominated the harness budget);
  *   2. `taskset -apc` self-pin to 8 cores -> timed full builds at local[8];
  *   3. new session at local[2] (sequential SparkContexts), pin to 2 cores
  *      -> timed full builds.
  *
  * Rep counts are budget-driven (first rep per level is mandatory, extras
  * only while the in-child deadline allows; best-of shields host-load
  * noise). Every timed rep prints `SCALEPAIR rep n=<n> secs=<s>`; the final
  * line is `SCALEPAIR done idx=<dir>` (the 8-core index path, reused by the
  * latency section). The parent kills this process on that line — exit-time
  * temp cleanup TRIMs hundreds of MB on the `discard`-mounted fs.
  *
  * Spark scratch goes to tmpfs (`/dev/shm`) so shuffle files never touch
  * the TRIM path at all (session stop between levels deletes them).
  */
object ScalePair {
  private val t0 = System.nanoTime()
  private def el: Double = (System.nanoTime() - t0) / 1e9

  // per-process scratch: two ScalePair instances must never share (or
  // startup-clean) each other's LIVE shuffle dirs
  private val localDir =
    s"/dev/shm/graft-scalepair-local-${ProcessHandle.current().pid()}"

  private def session(n: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$n]")
      .appName(s"graft-scalepair-$n")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.sql.files.openCostInBytes", "0")
      .config("spark.local.dir", localDir)
      // v2 committer: task-side output commit (parallel) instead of the v1
      // serial driver-side commitJob rename loop — pure serial time per
      // write job at every parallelism level. Safe here: fresh staging dirs,
      // no speculative execution in local mode.
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }

  private def pin(spec: String): Unit = {
    try {
      val p = new ProcessBuilder("taskset", "-apc", spec,
        ProcessHandle.current().pid().toString)
        .redirectErrorStream(true).start()
      p.getInputStream.readAllBytes()
      if (p.waitFor() == 0) println(s"SCALEPAIR pinned=$spec")
      else System.err.println(s"SCALEPAIR warn: pin '$spec' failed")
    } catch { case _: java.io.IOException => () }
  }

  def main(args: Array[String]): Unit = {
    val corpusDir = args(0)
    val outBase = args(1)
    val budget = args(2).toDouble
    val warmFrac = if (args.length > 3) args(3).toLong else 16L
    def remaining: Double = budget - el
    val cfg = IndexConfig(
      shards = sys.env.getOrElse("GRAFT_SHARDS", "16").toInt,
      termBuckets = sys.env.getOrElse("GRAFT_TB", "4").toInt,
      commitWaves = 1)

    // stale scratch/indexes from destroyed prior runs: tmpfs delete is free.
    // Age-gated (>20 min) so a concurrently-running instance's LIVE dirs
    // are never touched.
    val shm = java.nio.file.Paths.get("/dev/shm")
    val cutoff = System.currentTimeMillis() - 20 * 60 * 1000
    java.nio.file.Files.list(shm).forEach { p =>
      val n = p.getFileName.toString
      if ((n.startsWith("graft-scalepair") || n.startsWith("graft-bench-sp")) &&
          java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff) {
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }

    var idx8 = ""
    var rep = 0
    def timedRep(s: SparkSession, n: Int): Double = {
      val dir = s"$outBase-n$n-r$rep"
      rep += 1
      val docs = Corpus.fromCodeDocs(s.read.parquet(corpusDir))
      val t = System.nanoTime()
      IndexBuilder.build(s, docs, dir, cfg)
      val secs = (System.nanoTime() - t) / 1e9
      if (n == 8) idx8 = dir
      println(f"SCALEPAIR rep n=$n secs=$secs%.3f el=$el%.1f")
      secs
    }

    // --- shared boot + warm -----------------------------------------------
    // warm PINNED to the 8-core set: an unpinned warm leaves the first
    // pinned rep paying thread/cache migration + JIT tail (observed: first
    // rep consistently 20-60% slower than the second)
    val s8 = session(8)
    pin("0-7")
    if (warmFrac > 0) {
      val docs = Corpus.fromCodeDocs(s8.read.parquet(corpusDir))
      IndexBuilder.build(s8, docs.where(s"docId % $warmFrac = 0"),
        s"$outBase-warm", cfg)
      println(f"SCALEPAIR warm el=$el%.1f")
    }

    // --- level 4N = 8 cores ----------------------------------------------
    var r8min = timedRep(s8, 8)
    // second rep (cheap, and the 8-core time is the noisier eff factor)
    // whenever the budget still leaves room for the mandatory 2-core rep
    // (estimated at 3x the best 8-core rep)
    if (remaining > 1.15 * r8min + 1.25 * 3.0 * r8min + 6)
      r8min = math.min(r8min, timedRep(s8, 8))
    s8.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()

    // --- level N = 2 cores -----------------------------------------------
    // session init at full speed; timed work re-pins below
    pin(s"0-${Runtime.getRuntime.availableProcessors() - 1}")
    val s2 = session(2)
    pin("0-1")
    if (warmFrac > 0) {
      // small pinned settle-build: the first rep after a session switch
      // otherwise pays thread/cache migration on the new 2-core set
      val docs = Corpus.fromCodeDocs(s2.read.parquet(corpusDir))
      IndexBuilder.build(s2, docs.where(s"docId % ${warmFrac * 4} = 0"),
        s"$outBase-warm2", cfg)
      println(f"SCALEPAIR warm2 el=$el%.1f")
    }
    var r2min = timedRep(s2, 2)
    var n2 = 1
    while (n2 < 3 && remaining > 1.25 * r2min + 5) {
      r2min = math.min(r2min, timedRep(s2, 2))
      n2 += 1
    }

    println(s"SCALEPAIR done idx=$idx8 el=${f"$el%.1f"}")
    System.out.flush()
    // skip exit hooks entirely (see class doc); the parent also kills us
    Runtime.getRuntime.halt(0)
  }
}
