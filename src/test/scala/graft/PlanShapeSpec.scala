package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{Bucketing, Tables}

/** Locks in the SURVEY §4 plan claims: predicate pushdown reaches the
  * parquet scan, dims broadcast, and bucketed tables join without a
  * shuffle. */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    GraftSession.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
  }
  val dir = "/root/testdata/sf0.001"

  def plan(df: DataFrame): SparkPlan = castToImpl(df).queryExecution.executedPlan

  test("filters are pushed into the parquet scan") {
    val df = SparkEntry.queries("q2_filter_project")(spark, dir)
    val scans = plan(df).toString
    assert(scans.contains("PushedFilters: [IsNotNull(l_shipdate)"),
      s"expected pushed filters in:\n$scans")
    assert(!scans.contains("l_comment"), "column pruning lost")
  }

  test("dim join broadcasts the small side") {
    val df = SparkEntry.queries("q3_join_broadcast")(spark, dir)
    df.count() // let AQE finalize
    assert(plan(df).toString.contains("BroadcastHashJoin"),
      s"expected broadcast join in:\n${plan(df)}")
  }

  test("bucketed tables join with zero exchanges") {
    spark.sparkContext.setLogLevel("ERROR")
    // the session may be shared across suites (getOrCreate) with a
    // CWD warehouse; clear catalog entries AND stale on-disk locations
    // left by previous forked runs
    val wh = new java.net.URI(spark.conf.get("spark.sql.warehouse.dir")).getPath
    Seq("b_orders", "b_lineitem").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val d = new java.io.File(wh, t)
      if (d.exists()) {
        d.listFiles().foreach(_.delete()); d.delete()
      }
    }
    Bucketing.writeBucketed(Tables.load(spark, dir, "orders"), "b_orders",
      "o_orderkey", 4)
    Bucketing.writeBucketed(
      Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
      "b_lineitem", "l_orderkey", 4)
    val joined = Bucketing.colocatedJoin(spark, "b_orders", "b_lineitem",
      "o_orderkey", "l_orderkey")
    assert(joined.count() > 0)
    // the planner may still elect to BROADCAST a small bucketed side
    // (legitimate, also shuffle-free); the claim is no shuffle exchange
    val shuffles = plan(joined).collect { case e: ShuffleExchangeLike => e }
    assert(shuffles.isEmpty,
      s"bucketed join must not shuffle, found: $shuffles\n${plan(joined)}")
    // sanity: result matches the plain (shuffled) join
    val plain = Tables.load(spark, dir, "orders").join(
      Tables.load(spark, dir, "lineitem").select("l_orderkey", "l_quantity"),
      col("o_orderkey") === col("l_orderkey"))
    assert(joined.count() == plain.count())
  }
}
