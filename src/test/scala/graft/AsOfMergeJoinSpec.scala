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
    // and with a staleness bound: matches older than the tolerance
    // null-extend identically in both formulations
    val tol = java.time.Duration.ofMinutes(10)
    val execTol = AsOfJoin.merge(o, r, "currency", "r_currency",
        "orderTime", "exchangeRateTime", tolerance = Some(tol))
      .select(col("id"), col("rate"), col("exchangeRateTime"))
    val windowTol = AsOfJoin.backward(o, RefTables.rates(e), "currency",
        "orderTime", "exchangeRateTime", Seq("rate", "exchangeRateTime"),
        tolerance = Some(tol))
      .select(col("id"), col("rate"), col("exchangeRateTime"))
    assert(execTol.count() == o.count())
    assert(execTol.where(col("rate").isNull).count() > 0,
      "tolerance must actually null-extend some stale matches")
    assert(execTol.where(col("rate").isNull).count() <
      viaExec.where(col("rate").isNull).count() + o.count(),
      "sanity: not everything nulled")
    assert(execTol.exceptAll(windowTol).isEmpty &&
      windowTol.exceptAll(execTol).isEmpty,
      "tolerance semantics must agree between exec and window forms")
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

  test("null times: left null-extends, right rows with null time are skipped") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val l = Seq((1, "EUR", Some(ts(100))), (2, "EUR", None))
      .toDF("id", "k", "t")
    val r = Seq(("EUR", Option(ts(50)), 7), ("EUR", Option.empty[java.sql.Timestamp], 99))
      .toDF("rk", "rt", "rate")
    val res = AsOfJoin.merge(l, r, "k", "rk", "t", "rt")
      .select("id", "rate").collect()
      .map(x => x.getInt(0) -> (if (x.isNullAt(1)) -1 else x.getInt(1))).toMap
    // id 1 matches the ts(50) rate; the null-time rate 99 never matches;
    // id 2 (null order time) is null-extended, NOT treated as epoch 0
    assert(res == Map(1 -> 7, 2 -> -1), s"got $res")
  }

  test("non-time-typed time column is rejected at construction") {
    import spark.implicits._
    val l = Seq((1, "EUR", "not-a-time")).toDF("id", "k", "t")
    val r = Seq(("EUR", "also-not", 7)).toDF("rk", "rt", "rate")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.merge(l, r, "k", "rk", "t", "rt")
    }
    assert(e.getMessage.contains("TIMESTAMP"))
  }

  test("window as-of join keeps all right fields from the SAME matched row") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // the later right row carries a NULL aux value: a per-column
    // last(ignoreNulls) carry would pair rate=9 with aux="a" (from the
    // older row); the struct carry must yield (9, null)
    val l = Seq((1, "EUR", ts(100))).toDF("id", "currency", "t")
    val r = Seq(("EUR", ts(10), Some(7), Some("a")),
        ("EUR", ts(90), Some(9), Option.empty[String]))
      .toDF("currency", "rt", "rate", "aux")
    val res = AsOfJoin.backward(l, r, "currency", "t", "rt", Seq("rate", "aux"))
      .select("id", "rate", "aux").collect().head
    assert(res.getInt(1) == 9 && res.isNullAt(2),
      s"expected (9, null) from the matched row, got $res")
  }

  test("window as-of tolerance checks the matched row's own timestamp") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    val l = Seq((1, "EUR", ts(100))).toDF("id", "currency", "t")
    // latest rate is 80s stale; with 10s tolerance nothing matches
    val r = Seq(("EUR", ts(20), 7)).toDF("currency", "rt", "rate")
    val res = AsOfJoin.backward(l, r, "currency", "t", "rt", Seq("rate"),
      tolerance = Some(java.time.Duration.ofSeconds(10))).collect().head
    assert(res.isNullAt(res.fieldIndex("rate")), s"stale rate must be nulled: $res")
    val res2 = AsOfJoin.backward(l, r, "currency", "t", "rt", Seq("rate"),
      tolerance = Some(java.time.Duration.ofSeconds(90))).collect().head
    assert(res2.getInt(res2.fieldIndex("rate")) == 7, s"fresh rate must attach: $res2")
  }

  test("as-of join resolves right-side timestamp ties deterministically") {
    import spark.implicits._
    def ts(s: Long) = new java.sql.Timestamp(s * 1000)
    // two right rows share (key, time): without an explicit tiebreak
    // last() is partition-order-dependent (a latent oracle-hash flake);
    // the greatest pack — here the greatest rate — must win, on every
    // run, under any partitioning, in both directions
    val l = Seq((1, "EUR", ts(100)), (2, "EUR", ts(5))).toDF("id", "currency", "t")
    val r = Seq(("EUR", ts(50), 3), ("EUR", ts(50), 9), ("EUR", ts(50), 7))
      .toDF("currency", "rt", "rate")
    for (parts <- Seq(1, 7)) {
      val rp = r.repartition(parts)
      val b = AsOfJoin.backward(l, rp, "currency", "t", "rt", Seq("rate"))
        .where(col("id") === 1).select("rate").collect().head.getInt(0)
      assert(b == 9, s"backward tie must pick the greatest pack, got $b")
      val f = AsOfJoin.forward(l, rp, "currency", "t", "rt", Seq("rate"))
        .where(col("id") === 2).select("rate").collect().head.getInt(0)
      assert(f == 9, s"forward tie must pick the greatest pack, got $f")
    }
  }
}
