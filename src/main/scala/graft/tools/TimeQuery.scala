package graft.tools

import org.apache.spark.sql.SparkSession

/** Time one (or more) SparkEntry queries in a warm session — the breadth
  * pass's unit of measurement, isolated for plan/latency iteration:
  *
  * `runMain graft.tools.TimeQuery <sfDir> <query>[,query2,...] [reps]`
  *
  * Prints `TIMEQ <name> rep=<i> secs=<s>` per rep (rep 0 pays any
  * index-cache build + first-scan costs; later reps are the steady state).
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val names = args(1).split(",").toSeq
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions", 64)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "8m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      (0 until reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"TIMEQ $name rep=$r secs=${(System.nanoTime() - t0) / 1e9}%.3f rows=$n")
      }
    }
    spark.stop()
  }
}
