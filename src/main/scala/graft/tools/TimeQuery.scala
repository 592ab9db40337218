package graft.tools

import graft.SparkEntry

/** Time a single SparkEntry query: `runMain graft.tools.TimeQuery <name> [sfDir]`.
  * Warmup run + two timed runs, prints best. */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Double = {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(name)(spark, sfDir).count()
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name%s: $s%.2f s ($n rows)")
      s
    }
    once(); once(); once()
    spark.stop()
  }
}
