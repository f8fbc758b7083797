package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, lit, pmod}

import graft.corpus.{Corpus, SyntheticCorpus}
import graft.index.{IndexBuilder, IndexConfig, PostingIndex}

/** Delete-lifecycle cost probe at soak scale:
  * `runMain graft.tools.LifecycleProbe [docs=2000000] [cpus=32]`.
  *
  * Builds a production-layout index over the deterministic synthetic
  * corpus in /dev/shm, then measures the three lifecycle costs a served
  * deployment cares about and their latency effects:
  *
  *  1. `delete_sec` — tombstoning 1/7 of the corpus (the claim: O(|ids|),
  *     no index rewrite, so seconds even when compact takes minutes);
  *  2. `overlay_p50/p95` vs `base_p50/p95` — serving latency with the
  *     overlay binary search in the DAAT loops (the claim: invisible);
  *  3. `compact_sec` vs `build_sec` — the batched statistics refresh
  *     (the claim: cheaper than the build, since compaction re-encodes
  *     from materialized tf and never re-tokenizes).
  *
  * Prints ONE JSON line. Deterministic corpus + fixed seeds — rerunnable.
  */
object LifecycleProbe {
  private def timed[A](f: => A): (A, Double) = {
    val t0 = System.nanoTime()
    val a = f
    (a, (System.nanoTime() - t0) / 1e9)
  }

  private val queries = Seq(
    "longest river", "best complexity", "world war one",
    "artificial intelligence", "climate change", "science", "return")

  private def sample(idx: PostingIndex): (Double, Double) = {
    queries.foreach(q => idx.search(q, 10).collect()) // warm
    val lat = (1 to 5).flatMap { _ =>
      queries.map(q => timed(idx.search(q, 10).collect())._2)
    }.sorted
    (lat(lat.size / 2), lat(math.min(lat.size - 1, (lat.size * 0.95).toInt)))
  }

  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toLong else 2000000L
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      // driver memory cannot be set post-launch in local mode — it must
      // come from the launcher (build.sbt javaOptions / sbt -mem); assert
      // enough heap for the 2M-doc default instead of silently thrashing
      .getOrCreate()
    require(Runtime.getRuntime.maxMemory() > (4L << 30) || nDocs <= 500000,
      s"heap ${Runtime.getRuntime.maxMemory() >> 20} MB is too small for " +
        s"$nDocs docs — launch with a larger -Xmx (sbt javaOptions)")
    spark.sparkContext.setLogLevel("ERROR")
    val cfg = IndexConfig(shards = 32, termBuckets = 8, commitWaves = 2)

    val corpusDir = s"/dev/shm/graft-lcprobe-corpus-$nDocs"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(corpusDir, "_SUCCESS")))
      SyntheticCorpus.generate(spark, nDocs, 42L, 160, 480, parts = 256)
        .write.mode("overwrite").parquet(corpusDir)
    val docs = Corpus.fromCodeDocs(spark.read.parquet(corpusDir))

    val dir = s"/dev/shm/graft-lcprobe-idx-${System.nanoTime()}"
    try {
      val (_, buildSec) = timed(IndexBuilder.build(spark, docs, dir, cfg))
      val base = PostingIndex.forDir(spark, dir).preload()
      val (p50a, p95a) = sample(base)

      val delIds = docs.select(col("docId"))
        .filter(pmod(col("docId"), lit(7L)) === 3)
      val (_, delSec) = timed(IndexBuilder.delete(spark, delIds, dir, "probe"))
      PostingIndex.invalidate(dir)
      val over = PostingIndex.forDir(spark, dir).preload()
      val (nTomb, overlayLoadSec) = timed(over.search("return", 1).collect())
      val (p50b, p95b) = sample(over)

      val (_, compactSec) = timed(IndexBuilder.compact(spark, dir, cfg))
      PostingIndex.invalidate(dir)
      val post = PostingIndex.forDir(spark, dir).preload()
      val (p50c, p95c) = sample(post)
      val g = PostingIndex.readGlobals(spark, dir)

      def f(d: Double) = f"$d%.4f".replace(",", ".")
      println(
        s"""{"docs":$nDocs,"build_sec":${f(buildSec)},""" +
        s""""base_p50":${f(p50a)},"base_p95":${f(p95a)},""" +
        s""""delete_sec":${f(delSec)},"overlay_first_sec":${f(overlayLoadSec)},""" +
        s""""overlay_p50":${f(p50b)},"overlay_p95":${f(p95b)},""" +
        s""""compact_sec":${f(compactSec)},"survivors":${g.nDocs},""" +
        s""""post_p50":${f(p50c)},"post_p95":${f(p95c)}}""")
      val _ = nTomb
    } finally {
      val root = java.nio.file.Paths.get(dir)
      if (java.nio.file.Files.exists(root))
        java.nio.file.Files.walk(root)
          .sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
          .forEach(p => java.nio.file.Files.delete(p))
      spark.stop()
    }
  }
}
