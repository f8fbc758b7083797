package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Time individual SparkEntry queries against an sf dir:
  * `runMain graft.tools.QueryTimer <sfDir> <name> [<name>...]` — prints
  * `QTIMER <name> rows=<n> secs=<s>` per query (one warm session).
  */
object QueryTimer {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args.drop(1)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val qs = SparkEntry.queries
    names.foreach { n =>
      val t0 = System.nanoTime()
      val rows = qs(n)(spark, sfDir).count()
      println(f"QTIMER $n rows=$rows secs=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    spark.stop()
  }
}
