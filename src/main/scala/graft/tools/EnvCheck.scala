package graft.tools
object EnvCheck { def main(a: Array[String]): Unit = println("SPARK_HOME=" + sys.env.get("SPARK_HOME")) }
