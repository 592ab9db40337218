package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** `ANALYZE TABLE … COMPUTE STATISTICS` (f44): manifest-derived
  * CatalogStatistics reach Catalyst — row count and byte size with
  * ZERO data IO, FOR COLUMNS with exactly one aggregate job — and
  * actually CHANGE plans: filter selectivity from the injected column
  * stats flips a join to broadcast that the no-stats plan
  * sort-merges. */
class AnalyzeStatsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  /** 200k rows, k uniform 0..199999, v pseudo-random (kills delta
    * encoding so the no-stats byte estimate stays honestly large),
    * one partition value. */
  private def mkTable(name: String): Unit = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("an").toString + "/cat"
    val df = (0 until 200000).map(i =>
      (i.toLong, (i.toLong * 2654435761L) % 1000003L, "all"))
      .toDF("k", "v", "p")
    df.write.format("graft")
      .option("path", root).option("partitionBy", "p")
      .option("clusterBy", "k").option("files", "4")
      .mode("overwrite").save()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$root')")
  }

  /** Total records read by Spark tasks while `body` runs — the
    * data-IO measure: catalog-snapshot metadata reads are O(files)
    * rows, a data scan is O(table) rows. */
  private def recordsReadDuring(body: => Unit): Long = {
    val counter = new java.util.concurrent.atomic.AtomicLong(0)
    val l = new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(
          te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit =
        if (te.taskMetrics != null)
          counter.addAndGet(te.taskMetrics.inputMetrics.recordsRead)
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      org.apache.spark.sql.graftshim.SparkShims.drainListenerBus(spark)
    }
    finally spark.sparkContext.removeSparkListener(l)
    counter.get()
  }

  private def withConf(kvs: (String, String)*)(body: => Unit): Unit = {
    val olds = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally olds.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bare ANALYZE: zero data IO, exact row count reaches plan stats") {
    mkTable("an_t1")
    // warm the relation first: the FIRST resolution samples a parquet
    // footer for the schema (a resolution cost, not ANALYZE's)
    spark.table("an_t1").queryExecution.analyzed
    val records = recordsReadDuring {
      spark.sql("ANALYZE TABLE an_t1 COMPUTE STATISTICS") }
    // catalog-SNAPSHOT reads are O(manifest rows) — a data scan would
    // read the table's 200k
    assert(records < 1000,
      s"row count and size come from the manifest — read $records records")
    withConf("spark.sql.cbo.enabled" -> "true") {
      val st = spark.table("an_t1").queryExecution.optimizedPlan.stats
      assert(st.rowCount.contains(BigInt(200000)),
        s"exact footer row count must reach Catalyst: ${st.rowCount}")
      assert(st.sizeInBytes > 0)
    }
  }

  test("FOR COLUMNS: NDV/min/max land; DML keeps working after") {
    mkTable("an_t2")
    spark.sql("ANALYZE TABLE an_t2 COMPUTE STATISTICS FOR COLUMNS k, v")
    withConf("spark.sql.cbo.enabled" -> "true") {
      val st = spark.table("an_t2").queryExecution.optimizedPlan.stats
      val byName = st.attributeStats.map { case (a, s) => a.name -> s }
      assert(byName.contains("k") && byName.contains("v"), s"$byName")
      val k = byName("k")
      assert(k.min.contains(0L) && k.max.contains(199999L), s"$k")
      assert(k.distinctCount.exists(_.toLong > 150000L), s"NDV: $k")
    }
    spark.sql("DELETE FROM an_t2 WHERE k < 10")
    assert(spark.sql("SELECT count(*) AS n FROM an_t2")
      .collect().head.getLong(0) == 199990L)
  }

  test("column stats flip a selective-filter join to broadcast") {
    import spark.implicits._
    mkTable("an_t3")
    // `big` must be a FILE relation: a LocalRelation would have the
    // inferred join-side filter (k < 200) evaluated eagerly by the
    // optimizer, shrinking it below the threshold with no stats at all
    val bigPath = java.nio.file.Files
      .createTempDirectory("anbig").toString + "/big"
    (0 until 20000).map(i => (i.toLong, s"b$i")).toDF("k", "s")
      .write.mode("overwrite").parquet(bigPath)
    val big = spark.read.parquet(bigPath)
    def joined = big.join(
      spark.table("an_t3").where(col("k") < 200), "k")
    def isBroadcast = joined.queryExecution.sparkPlan.collect {
      case b: org.apache.spark.sql.execution.joins
        .BroadcastHashJoinExec => b }.nonEmpty
    withConf(
      "spark.sql.cbo.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "20000",
      "spark.sql.adaptive.enabled" -> "false") {
      assert(!isBroadcast,
        "test premise: without stats the filtered side must look big " +
          "(raise the table size if this fails)")
      spark.sql("ANALYZE TABLE an_t3 COMPUTE STATISTICS FOR COLUMNS k")
      assert(isBroadcast,
        "injected column stats must shrink the filtered side below " +
          "the broadcast threshold (k < 200 is 1% of the range)")
    }
  }

  test("FOR ALL COLUMNS covers every supported column; unknown refuses") {
    mkTable("an_t4")
    spark.sql("ANALYZE TABLE an_t4 COMPUTE STATISTICS FOR ALL COLUMNS")
    withConf("spark.sql.cbo.enabled" -> "true") {
      val st = spark.table("an_t4").queryExecution.optimizedPlan.stats
      assert(st.attributeStats.size >= 3, s"${st.attributeStats}")
    }
    val e = intercept[Exception] {
      spark.sql("ANALYZE TABLE an_t4 COMPUTE STATISTICS FOR COLUMNS nope") }
    assert(e.getMessage.contains("does not exist"), e.getMessage)
  }
}
