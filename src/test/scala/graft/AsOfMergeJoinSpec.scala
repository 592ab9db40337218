package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.sources.{RefTables, Tables}

class AsOfMergeJoinSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local(4)

  test("custom AsOfMergeJoinExec matches the window-based as-of join") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val o = RefTables.orders(e)
    val r = RefTables.rates(e)
      .withColumnsRenamed(Map("currency" -> "r_currency"))
    val viaExec = AsOfJoin.merge(o, r, "currency", "r_currency",
        "orderTime", "exchangeRateTime")
      .select(col("id"), col("rate"), col("exchangeRateTime"))
    val viaWindow = AsOfJoin.backward(o, RefTables.rates(e), "currency",
        "orderTime", "exchangeRateTime", Seq("rate", "exchangeRateTime"))
      .select(col("id"), col("rate"), col("exchangeRateTime"))
    assert(viaExec.count() == o.count(), "left cardinality preserved")
    assert(viaExec.exceptAll(viaWindow).isEmpty &&
      viaWindow.exceptAll(viaExec).isEmpty,
      "custom exec and window formulation must agree row-for-row")
  }

  test("physical plan contains the custom exec node") {
    val e = Tables.load(spark, "/root/testdata/sf0.001", "events")
    val o = RefTables.orders(e)
    val r = RefTables.rates(e).withColumnsRenamed(Map("currency" -> "r_currency"))
    val df = AsOfJoin.merge(o, r, "currency", "r_currency",
      "orderTime", "exchangeRateTime")
    val plan = org.apache.spark.sql.classic.ClassicConversions.castToImpl(df)
      .queryExecution.sparkPlan
    assert(plan.exists(_.isInstanceOf[graft.plans.AsOfMergeJoinExec]),
      s"expected AsOfMergeJoinExec in:\n$plan")
  }

  test("rows with no earlier rate are null-extended") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val l = Seq((1, "EUR", ts(10)), (2, "EUR", ts(100)), (3, "GBP", ts(50)))
      .toDF("id", "k", "t")
    val r = Seq(("EUR", ts(50), 7), ("EUR", ts(90), 9), ("USD", ts(1), 5))
      .toDF("rk", "rt", "rate")
    val res = AsOfJoin.merge(l, r, "k", "rk", "t", "rt")
      .select("id", "rate").collect()
      .map(x => x.getInt(0) -> (if (x.isNullAt(1)) -1 else x.getInt(1))).toMap
    assert(res == Map(1 -> -1, 2 -> 9, 3 -> -1), s"got $res")
  }
}
