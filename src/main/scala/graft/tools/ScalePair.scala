package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig}

/** The bench's two-parallelism-level scaling measurement in ONE child JVM
  * (`runMain graft.tools.ScalePair <corpusDir> <outBase> <budgetSec> [warmDir]`):
  *
  *   1. boot + Spark session + untimed warm-up build over `warmDir` (a small
  *      SEPARATE corpus directory) — paid ONCE (a separate child per level
  *      pays JVM boot, session init and JIT twice, and that overhead
  *      dominated the harness budget). The warm build reads its own parquet
  *      dir rather than a `docId % k` slice of the main corpus: a slice
  *      filter changes the logical plan, so Spark generates DIFFERENT
  *      whole-stage-codegen classes and the first timed rep then pays
  *      Janino + JIT compilation of its own classes — observed as rep 1
  *      running 40% slower than rep 2 at 8 cores. Same plan shape ->
  *      codegen cache + JIT state carry into the timed reps;
  *   2. `taskset -apc` self-pin to 8 cores -> timed full builds at local[8];
  *   3. new session at local[2] (sequential SparkContexts), pin to 2 cores
  *      -> timed full builds.
  *
  * With `GRAFT_SP_GATE=1` (set by the bench parent) the run is TWICE
  * stdin-gated: the first timed rep waits for a "GO" line (the parent
  * overlaps its own untimed prewarm with this child's boot+warm window and
  * releases the gate when it goes idle), and the first 8-CORE rep waits
  * for "GO2" (the parent overlaps its tier-2 breadth pass with this
  * child's HEDGE window — the second 2-core rep + the untimed 8-core warm,
  * announced by the `SCALEPAIR overlapok` line — and releases GO2 when
  * that work quiesces). Parent load can therefore pollute at most the
  * 2-core HEDGE rep (which only the min() survives, and only by being
  * SLOWER — it can never fabricate a better denominator), never the
  * mandatory first rep of either level. Both waits are deadline-bounded
  * (a dead parent costs the cap, not the run) and report `go=false` for
  * the bench to stamp `gate_timeout`.
  *
  * Rep counts are budget-driven and SYMMETRIC (the round-4 verdict: an
  * asymmetric repsN=1/reps4N=2 draw let one slow 2-core rep manufacture a
  * super-linear 1.025 efficiency): the first rep per level is mandatory,
  * the second 2-core rep runs only when the budget also covers its 8-core
  * twin, and the 8-core level runs EXACTLY as many reps as the 2-core
  * level did — best-of-k against best-of-k, never best-of-1 against
  * best-of-3. Every timed rep prints `SCALEPAIR rep n=<n> secs=<s>`; the
  * final line is `SCALEPAIR done idx=<dir>` (the 8-core index path,
  * reused by the latency section). The parent kills this process on that
  * line — exit-time temp cleanup TRIMs hundreds of MB on the
  * `discard`-mounted fs.
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
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("GRAFT_MAX_PART_BYTES", "8m"))
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
    // Captured BEFORE any taskset self-pin: the JDK reads sched_getaffinity,
    // so after pin("0-1") availableProcessors() returns 2 and an "unpin"
    // computed from it would re-pin to cores 0-1 (the 8-core session init
    // would then run on 2 cores, burning bench budget).
    val allCores = Runtime.getRuntime.availableProcessors()
    println(f"SCALEPAIR main el=$el%.1f cores=$allCores")
    val corpusDir = args(0)
    val outBase = args(1)
    val budget = args(2).toDouble
    val warmDir = if (args.length > 3) args(3) else ""
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
      if ((n.startsWith("graft-scalepair") || n.startsWith("graft-bench-sp") ||
           n.startsWith("graft-buildto-local")) &&
          java.nio.file.Files.getLastModifiedTime(p).toMillis < cutoff) {
        java.nio.file.Files.walk(p)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(f => java.nio.file.Files.deleteIfExists(f))
      }
    }

    // SELF-ABORT watchdog: a mandatory rep that balloons under host load
    // (cold caches + a contended warm window -> un-JITed first rep) once
    // overran the whole parent budget with nothing emitted; the parent's
    // reader then blocked until ITS global watchdog — which killed the
    // breadth/latency sections too. Past 1.25x budget + 25 s this child is
    // not going to produce a usable pair: say so on stdout (the parent
    // unblocks on EOF and falls back budget-aware) and halt.
    val abortAt = budget * 1.25 + 25.0
    val selfAbort = new Thread(() => {
      try Thread.sleep(math.max(1L, ((abortAt - el) * 1000).toLong))
      catch { case _: InterruptedException => return }
      println(f"SCALEPAIR abort reason=budget-overrun el=$el%.1f budget=$budget%.1f")
      System.out.flush()
      Runtime.getRuntime.halt(3)
    }, "scalepair-self-abort")
    selfAbort.setDaemon(true)
    selfAbort.start()

    var idx8 = ""
    var rep = 0

    /** Warm builds exist for their JIT/codegen side effects, not their
      * output — so they are time-boxed: under neighbor load an UNTIMED warm
      * was observed to balloon to 106 s (6x its quiet cost) and starve the
      * mandatory timed reps out of the parent's whole budget. On timeout,
      * cancel the jobs and proceed — the hot loops compiled during the
      * partial build are retained, and the timed rep JIT-amortizes any
      * remainder in-flight (measured: 2-core reps show no first-rep penalty
      * even with modest warming).
      */
    def warmBoxed(s: SparkSession, dir: String, boxSec: Double): Unit = {
      import scala.concurrent.{Await, Future}
      import scala.concurrent.duration._
      import scala.concurrent.ExecutionContext.Implicits.global
      val docs = Corpus.fromCodeDocs(s.read.parquet(warmDir))
      val fut = Future(IndexBuilder.build(s, docs, dir, cfg))
      try Await.result(fut, boxSec.seconds)
      catch {
        case _: java.util.concurrent.TimeoutException =>
          println(f"SCALEPAIR warm TIMEOUT ${boxSec}%.0f s dir=$dir el=$el%.1f")
          // DRAIN the abandoned build before returning: cancelAllJobs only
          // kills jobs active at that instant — if the build thread is in a
          // driver-side phase between actions it would keep submitting jobs
          // CONCURRENTLY with the pinned timed reps (contaminating the
          // headline ratio). Cancel repeatedly until the future completes
          // (the next action it submits dies and the build throws out).
          var drained = false
          var tries = 0
          while (!drained && tries < 30) {
            s.sparkContext.cancelAllJobs()
            try { Await.result(fut, 1.second); drained = true }
            catch {
              case _: java.util.concurrent.TimeoutException => tries += 1
              case _: Throwable => drained = true // build aborted — done
            }
          }
          if (!drained) println(s"SCALEPAIR warn: warm build not drained after $tries cancels")
        case _: Throwable => () // a cancelled write may surface as SparkException
      }
    }
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

    // --- level N = 2 cores FIRST ------------------------------------------
    // Measured on this box (224k docs, tmpfs): 2-core reps show NO first-rep
    // penalty (35.198 / 35.263 / 35.306 s) — a ~35 s rep JIT-compiles its
    // own hot loops in-flight and the cost is amortized inside the rep —
    // while an 8-core rep is short enough that residual compilation showed
    // up as a 17.5-vs-13.5 s first-rep penalty that no small warm build
    // removed. So: small warm, ONE stable 2-core rep, then the 8-core level
    // runs in a fully-JIT'd JVM (codegen classes are cached per-JVM across
    // sessions) and is cheap enough for best-of-2/3.
    val s2 = session(2)
    if (warmDir.nonEmpty) {
      // warm build with the exact plan shape of the reps, UNPINNED: the
      // 2 executor threads do the same JIT-triggering work, but the C2/
      // Janino compiler threads run on free cores — the same compiled code
      // lands in ~8 s instead of ~20 (a real executor JVM also JITs while
      // the cluster is otherwise busy; the timed reps below run fully
      // compiled either way). Pin AFTER: cache-migration settle is
      // negligible against a ~60 s rep.
      // box: JIT lands in ~8 s unpinned on a quiet host; a loaded draw once
      // spent 22 s here and starved the parent's breadth tail — cap tighter
      // and let the timed rep amortize any JIT remainder in-flight
      warmBoxed(s2, s"$outBase-warm2", math.min(math.max(12.0, 0.2 * budget), 25.0))
      println(f"SCALEPAIR warm2 el=$el%.1f")
    }
    // Parent-gated start of the TIMED section (GRAFT_SP_GATE=1, set by the
    // bench): the parent overlaps its own untimed prewarm with this child's
    // boot+warm window above, and releases the gate ("GO\n" on stdin) when
    // that prewarm is done — so a timed rep normally never runs under
    // parent load. A DEAD parent is detected by stdin EOF (cheap, fast), so
    // the deadline below only binds against a parent that is alive but
    // slower than the cap — there the child proceeds rather than starve its
    // own measurement, prints `go=false`, and the bench records the run as
    // gate-timed-out (`"gate_timeout":true` inside the JSON line's build
    // object) instead of claiming an unpolluted draw.
    // The two stdin gates share ONE daemon reader: EOF on a closed pipe is
    // only observable from a BLOCKING read — available() reports 0 forever
    // on a dead parent, so an available()-gated poll loop would sleep out
    // the whole cap. The reader flags GO / GO2 / EOF; gate waits poll the
    // flags against their own deadlines.
    val gated = sys.env.get("GRAFT_SP_GATE").contains("1")
    val goFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
    val go2Flag = new java.util.concurrent.atomic.AtomicBoolean(false)
    val eofFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
    if (gated) {
      val reader = new Thread(() => {
        try {
          val buf = new StringBuilder
          var c = System.in.read()
          while (c != -1 && !go2Flag.get) {
            if (c == '\n') {
              val line = buf.toString
              if (line.contains("GO2")) { goFlag.set(true); go2Flag.set(true) }
              else if (line.contains("GO")) goFlag.set(true)
              buf.clear()
            } else buf.append(c.toChar)
            if (!go2Flag.get) c = System.in.read()
          }
          if (c == -1) eofFlag.set(true) // parent gone: proceed, don't stall
        } catch { case _: Throwable => eofFlag.set(true) }
      }, "scalepair-gate-reader")
      reader.setDaemon(true)
      reader.start()
    }
    def awaitGate(flag: java.util.concurrent.atomic.AtomicBoolean,
                  capSec: Double, name: String): Unit = if (gated) {
      val deadline = System.nanoTime() + (capSec * 1e9).toLong
      while (!flag.get && !eofFlag.get && System.nanoTime() < deadline)
        Thread.sleep(25)
      println(f"SCALEPAIR gate$name go=${flag.get} eof=${eofFlag.get} el=$el%.1f")
    }
    awaitGate(goFlag, math.min(100.0, math.max(5.0, 0.6 * budget)), "")
    pin("0-1")
    var r2min = timedRep(s2, 2)
    var n2 = 1
    // SYMMETRIC second rep: run it only when the budget also covers its
    // 8-core twin (rep2 ~r2, warm8 box <=20, two 8-core reps ~0.55*r2,
    // level switch ~5) — the 8-core level then matches the 2-core count
    // exactly, so best-of-k compares against best-of-k
    if (remaining > 1.6 * r2min + 22) {
      // the parent overlaps its tier-2 breadth with everything from here
      // to the GO2 gate (this rep is a min()-shielded hedge; the warm8 is
      // untimed) — announce the window
      println(f"SCALEPAIR overlapok el=$el%.1f")
      r2min = math.min(r2min, timedRep(s2, 2))
      n2 = 2
    } else println(f"SCALEPAIR overlapok el=$el%.1f") // window = warm8 only
    s2.stop()
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()

    // --- level 4N = 8 cores ------------------------------------------------
    // session init at full speed; timed work re-pins below (allCores was
    // captured pre-pin — availableProcessors() here would report 2)
    pin(s"0-${allCores - 1}")
    val s8 = session(8)
    pin("0-7")
    if (warmDir.nonEmpty) {
      // settle-build on the new 8-core set (thread/cache migration)
      warmBoxed(s8, s"$outBase-warm8", 20.0)
      println(f"SCALEPAIR warm8 el=$el%.1f")
    }
    // second gate: the parent's overlapped tier-2 work must quiesce before
    // the first 8-core rep — the NUMERATOR's mandatory draw stays clean
    awaitGate(go2Flag, 50.0, "2")
    var r8min = timedRep(s8, 8)
    var n8 = 1
    // EXACTLY as many 8-core reps as 2-core reps (symmetry beats a third
    // hedge: the round-4 verdict flagged asymmetric best-of counts as the
    // source of an unphysical >1 efficiency); the budget check for rep 2
    // already happened at the 2-core decision, so run the twin
    // unconditionally — the self-abort cap bounds a loaded-host overrun
    while (n8 < n2) {
      r8min = math.min(r8min, timedRep(s8, 8))
      n8 += 1
    }

    println(s"SCALEPAIR done idx=$idx8 el=${f"$el%.1f"}")
    System.out.flush()
    // skip exit hooks entirely (see class doc); the parent also kills us
    Runtime.getRuntime.halt(0)
  }
}
