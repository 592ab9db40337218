package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._

import graft.SparkEntry

/** Per-JOB time attribution for a single SparkEntry query:
  * `runMain graft.tools.JobProfile <name> [sfDir]`.
  *
  * One warmup run, then one profiled run that prints every Spark job's
  * wall time, its description, and the DRIVER GAP before it (time since
  * the previous job ended — scheduling + planning + driver-side work).
  * The gap column is what separates "the cluster is computing" from
  * "the driver is planning/committing/listing" (optimization guide
  * §7.3); the job column localizes which action dominates a multi-job
  * operator pipeline.
  */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = graft.GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("ERROR")

    final case class J(id: Int, start: Long, var end: Long = 0L,
      var desc: String = "", var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap.empty[Int, J]
    val lock = new Object
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit =
        lock.synchronized {
          val d = Option(e.properties)
            .flatMap(p => Option(p.getProperty("spark.job.description")))
            .orElse(Option(e.properties)
              .flatMap(p => Option(p.getProperty("callSite.short"))))
            .getOrElse("") + " | " +
            e.stageInfos.map(_.name.takeWhile(_ != '\n')).distinct
              .mkString("; ").take(120)
          jobs(e.jobId) = J(e.jobId, e.time, desc = d,
            stages = e.stageInfos.size,
            tasks = e.stageInfos.map(_.numTasks).sum)
        }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        lock.synchronized {
          jobs.get(e.jobId).foreach(_.end = e.time)
        }
    })

    // warmup (codegen, JIT, footer caches) — same discipline as Bench
    SparkEntry.queries(name)(spark, sfDir).count()
    org.apache.spark.sql.graftshim.SparkShims.drainListenerBus(spark)
    lock.synchronized(jobs.clear())

    val t0 = System.nanoTime()
    val n = SparkEntry.queries(name)(spark, sfDir).count()
    val wall = (System.nanoTime() - t0) / 1e9
    org.apache.spark.sql.graftshim.SparkShims.drainListenerBus(spark)

    val js = lock.synchronized(jobs.values.toVector).sortBy(_.start)
    println(f"[profile] $name%s: wall $wall%.2f s, $n rows, ${js.size} jobs")
    println(f"${"job"}%5s ${"gap_ms"}%8s ${"run_ms"}%8s ${"stg"}%4s " +
      f"${"tasks"}%6s  description")
    var prevEnd = t0 / 1000000L // ms epoch-ish; listener times are ms
    // listener event times are System.currentTimeMillis-based; re-base
    // the first gap on the first job's start instead of t0
    if (js.nonEmpty) prevEnd = js.head.start
    var runSum = 0L; var gapSum = 0L
    js.foreach { j =>
      val gap = math.max(0L, j.start - prevEnd)
      val run = math.max(0L, j.end - j.start)
      gapSum += gap; runSum += run
      prevEnd = math.max(prevEnd, j.end)
      val d = if (j.desc.length > 80) j.desc.take(77) + "..." else j.desc
      println(f"${j.id}%5d $gap%8d $run%8d ${j.stages}%4d ${j.tasks}%6d  $d")
    }
    println(f"[profile] sum(run) ${runSum / 1000.0}%.2f s, " +
      f"sum(gaps between jobs) ${gapSum / 1000.0}%.2f s " +
      f"(wall also includes pre-first-job planning)")
    spark.stop()
  }
}
