package graft.tools

import org.apache.spark.sql.SparkSession

import graft.index.PostingIndex

/** Query-latency probe over an existing index dir:
  * `runMain graft.tools.QueryProbe <indexDir> [cpus]`.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = if (args.length > 1) args(1).toInt else 32
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val idx = new PostingIndex(spark, dir)
    if (args.length > 2 && args(2) == "preload") idx.preload()
    if (args.length > 2 && args(2) == "diff") {
      val other = new PostingIndex(spark, args(3))
      val qs0 = Seq("longest river", "best complexity", "world war one",
        "artificial intelligence", "climate change", "science", "return",
        "running caresses ponies relational")
      val bad = qs0.filter { q =>
        idx.search(q, 10).collect().toSeq.map(_.toSeq) !=
          other.search(q, 10).collect().toSeq.map(_.toSeq)
      }
      println(s"QDIFF mismatches=${bad.size} ${bad.mkString(",")}")
      spark.stop(); return
    }
    val qs = Seq("longest river", "best complexity", "world war one",
      "artificial intelligence", "climate change", "science", "return")
    if (args.length > 2 && args(2) == "batch") {
      idx.preload()
      idx.searchMany(qs, 10).collect() // warm
      val times = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        idx.searchMany(qs, 10).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"QBATCH docs=${idx.globals.nDocs} queries=${qs.size} best=${times.min}%.4f s per_query=${times.min / qs.size}%.4f s")
      spark.stop(); return
    }
    qs.foreach(q => idx.search(q, 10).collect())
    val lat = (1 to 5).flatMap { _ =>
      qs.map { q =>
        val t0 = System.nanoTime()
        idx.search(q, 10).collect()
        (System.nanoTime() - t0) / 1e9
      }
    }.sorted
    println(f"QPROBE docs=${idx.globals.nDocs} p50=${lat(lat.size / 2)}%.4f p95=${lat((lat.size * 0.95).toInt min (lat.size - 1))}%.4f max=${lat.last}%.4f")
    spark.stop()
  }
}
