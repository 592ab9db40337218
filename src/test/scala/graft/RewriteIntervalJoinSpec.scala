package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.Generate
import org.apache.spark.sql.classic.ClassicConversions.castToImpl
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RefTables, Tables}

class RewriteIntervalJoinSpec extends AnyFunSuite {
  lazy val spark = {
    val s = GraftSession.local(4)
    val e = Tables.load(s, "/root/testdata/sf0.001", "events")
    RefTables.orders(e).createOrReplaceTempView("o")
    RefTables.rates(e).createOrReplaceTempView("r")
    s
  }

  val intervalSql = """
    SELECT o.id, r.rate, o.amount * r.rate AS converted
    FROM o LEFT JOIN r ON o.currency = r.currency
      AND r.exchangeRateTime <= o.orderTime
      AND r.exchangeRateTime > o.orderTime - INTERVAL 6 HOUR"""

  def hasGenerate(df: DataFrame): Boolean =
    castToImpl(df).queryExecution.optimizedPlan.collect { case g: Generate => g }.nonEmpty

  test("SQL interval join is rewritten to the bucketed plan") {
    assert(hasGenerate(spark.sql(intervalSql)),
      "expected an Explode(Generate) from the bucket rewrite")
  }

  test("rewrite preserves results exactly (vs rule disabled)") {
    val on = spark.sql(intervalSql)
    spark.conf.set("spark.graft.rewriteIntervalJoins", "false")
    val off = try {
      val d = spark.sql(intervalSql)
      assert(!hasGenerate(d), "rule must respect the disable flag")
      d.collect().toSet
    } finally spark.conf.set("spark.graft.rewriteIntervalJoins", "true")
    assert(on.collect().toSet == off)
    assert(on.count() == spark.sql(intervalSql).groupBy().count().collect().head.getLong(0))
  }

  test("ordinary equi-joins and non-matching range joins are untouched") {
    val plain = spark.sql("SELECT o.id FROM o JOIN r ON o.currency = r.currency")
    assert(!hasGenerate(plain))
    // range without equality key: no skewable key, leave alone
    val noEqui = spark.sql("""
      SELECT o.id FROM o JOIN r
      ON r.exchangeRateTime <= o.orderTime
        AND r.exchangeRateTime > o.orderTime - INTERVAL 1 HOUR""")
    assert(!hasGenerate(noEqui))
  }
}
