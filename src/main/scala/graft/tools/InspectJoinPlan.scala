package graft.tools

import graft.GraftSession
import graft.sources.{RefTables, Tables}

object InspectJoinPlan {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(4)
    val e = Tables.load(spark, "/root/testdata/sf0.001", "events")
    RefTables.orders(e).createOrReplaceTempView("o")
    RefTables.rates(e).createOrReplaceTempView("r")
    val df = spark.sql("""
      SELECT o.id, o.amount * r.rate AS converted
      FROM o LEFT JOIN r ON o.currency = r.currency
        AND r.exchangeRateTime <= o.orderTime
        AND r.exchangeRateTime > o.orderTime - INTERVAL 5 SECOND""")
    val cls = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
    println("=== analyzed ===")
    println(cls.queryExecution.analyzed.treeString)
    println("=== optimized ===")
    println(cls.queryExecution.optimizedPlan.treeString)
    cls.queryExecution.optimizedPlan.foreach {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join =>
        j.condition.get.foreach(e => println("EXPR " + e.getClass.getName + "  :: " + e.dataType + " :: " + e))
      case _ =>
    }
    spark.stop()
  }
}
