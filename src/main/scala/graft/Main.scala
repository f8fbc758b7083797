package graft

import org.apache.spark.sql.SparkSession

import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexConfig, PostingIndex}

/** The spark-submit entry point (north rule: "runs via spark-submit on
  * multi-executor clusters"). Unlike the sandbox tools in [[graft.tools]],
  * this main NEVER sets a master — cluster manager, executor count and
  * memory come from spark-submit, so the same jar runs at N and 4N
  * executors unchanged:
  *
  * {{{
  * spark-submit --class graft.Main app.jar \
  *   build  <corpusParquet> <indexDir> [shards=32] [termBuckets=8] [stem=true]
  * spark-submit --class graft.Main app.jar \
  *   search <indexDir> <query...> [--k 10] [--conjunctive]
  * spark-submit --class graft.Main app.jar \
  *   serve  <sfDir> <port>
  * }}}
  *
  * The corpus is any parquet with the input-hint shape
  * (repo, path, commit, lang, content) — [[Corpus.fromCodeDocs]] derives
  * stable 64-bit docIds — and the index directory should be shared storage
  * (every stage reads/writes it through the Hadoop filesystem layer).
  */
object Main {

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-search-engine")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  def main(args: Array[String]): Unit = args.toList match {
    case "build" :: corpus :: idxDir :: rest0 =>
      // --warm: untimed 1/24-slice build first (JIT-compiles the hot paths
      // in the SAME executor JVMs so the reported time measures the job,
      // not JVM warm-up — a long-lived cluster pays JIT once per executor)
      val warm = rest0.contains("--warm")
      val rest = rest0.filterNot(_ == "--warm")
      val shards = rest.headOption.map(_.toInt).getOrElse(32)
      val tb = rest.lift(1).map(_.toInt).getOrElse(8)
      val stem = rest.lift(2).forall(_.toBoolean)
      val spark = session()
      val cfg = IndexConfig(shards = shards, termBuckets = tb, stem = stem)
      val docs = Corpus.fromCodeDocs(spark.read.parquet(corpus))
      if (warm) {
        val warmDir = java.nio.file.Files
          .createTempDirectory("graft-main-warm").toString
        IndexBuilder.build(spark, docs.where("docId % 24 = 0"), warmDir, cfg)
        println("warm-up build done")
      }
      val t0 = System.nanoTime()
      val g = IndexBuilder.build(spark, docs, idxDir, cfg)
      println(f"built index at $idxDir: docs=${g.nDocs} vocab=${g.vocabularySize} " +
        f"tokens=${g.totalTokens} in ${(System.nanoTime() - t0) / 1e9}%.1f s")
      spark.stop()

    case "search" :: idxDir :: rest if rest.nonEmpty =>
      // only `--k N` selects k — a bare number is a QUERY WORD ("2001
      // space odyssey" must not become k=2001)
      var k = 10
      var conj = false
      val words = List.newBuilder[String]
      var r = rest
      while (r.nonEmpty) {
        r match {
          case "--k" :: v :: tail => k = v.toInt; r = tail
          case "--conjunctive" :: tail => conj = true; r = tail
          case w :: tail => words += w; r = tail
          case Nil => ()
        }
      }
      val query = words.result().mkString(" ")
      val spark = session()
      val idx = new PostingIndex(spark, idxDir)
      val top = if (conj) idx.searchConjunctive(query, k) else idx.search(query, k)
      top.collect().foreach(r => println(f"${r.getLong(0)}%20d  ${r.getDouble(1)}%.6f"))
      spark.stop()

    case "serve" :: sfDir :: port :: Nil =>
      val spark = session()
      val srv = new server.SearchServer(spark, sfDir, port.toInt)
      srv.start()
      println(s"graft /search serving on :${srv.boundPort} (corpus $sfDir)")
      Thread.currentThread().join()

    case _ =>
      System.err.println(
        """usage: graft.Main build  <corpusParquet> <indexDir> [shards] [termBuckets] [stem]
          |       graft.Main search <indexDir> <query words...> [--k N] [--conjunctive]
          |       graft.Main serve  <sfDir> <port>""".stripMargin)
      sys.exit(2)
  }
}
