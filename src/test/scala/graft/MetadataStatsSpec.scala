package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileManifest

/** Metadata-only MIN/MAX and partition-filtered COUNT (f38) — the
  * guard discipline: the rewrite fires ONLY where the manifest
  * provably answers (plan asserts a LocalRelation, zero scans), and
  * every guarded form still scans (count(col) must see NULLs, data
  * predicates must see rows, non-cluster min/max has no stats). */
class MetadataStatsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  private def scansOf(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r }.size

  private def mkTable(name: String): String = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("ms").toString + "/cat"
    // include NULL cluster values in one partition: min/max must
    // ignore them (SQL semantics) while count(*) includes them
    val df = Seq[(java.lang.Long, java.lang.Long, String)](
      (1L, 10L, "a"), (2L, 20L, "a"), (null, 30L, "a"),
      (7L, 40L, "b"), (9L, 50L, "b"))
      .toDF("k", "c", "p")
    df.write.format("graft")
      .option("path", root).option("partitionBy", "p")
      .option("clusterBy", "k").option("files", "1")
      .mode("overwrite").save()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$root')")
    root
  }

  test("unfiltered count/min/max answer from the manifest, NULLs ignored by min/max only") {
    mkTable("ms_t1")
    val df = spark.sql(
      "SELECT count(*) AS n, min(k) AS mn, max(k) AS mx FROM ms_t1")
    assert(scansOf(df) == 0, "must plan zero scans")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((5L, 1L, 9L)))
  }

  test("partition-filtered count/min/max answer exactly from directory-decided entries") {
    mkTable("ms_t2")
    val df = spark.sql("SELECT count(*) AS n, min(k) AS mn, " +
      "max(k) AS mx FROM ms_t2 WHERE p = 'b'")
    assert(scansOf(df) == 0, "must plan zero scans")
    val r = df.collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) == ((2L, 7L, 9L)))
    // no matching partition: count 0, min/max NULL — the scan's answer
    val none = spark.sql("SELECT count(*) AS n, min(k) AS mn FROM ms_t2 " +
      "WHERE p = 'zzz'")
    assert(scansOf(none) == 0)
    val r2 = none.collect().head
    assert(r2.getLong(0) == 0L && r2.isNullAt(1))
  }

  test("guarded forms still scan") {
    mkTable("ms_t3")
    // count(col) must see NULLs
    assert(scansOf(spark.sql("SELECT count(k) AS n FROM ms_t3")) > 0)
    // data predicate must see rows
    assert(scansOf(spark.sql(
      "SELECT count(*) AS n FROM ms_t3 WHERE k > 1")) > 0)
    // mixed partition+data predicate must see rows
    assert(scansOf(spark.sql(
      "SELECT count(*) AS n FROM ms_t3 WHERE p = 'a' AND k > 1")) > 0)
    // min/max of a NON-cluster column has no manifest stats
    assert(scansOf(spark.sql("SELECT min(c) AS mn FROM ms_t3")) > 0)
    // distinct over a DATA column must see values
    assert(scansOf(spark.sql(
      "SELECT count(DISTINCT k) AS n FROM ms_t3")) > 0)
    // grouping on a DATA column must see rows (grouping by the
    // partition column is metadata-answerable — the GROUP BY test)
    assert(scansOf(spark.sql(
      "SELECT k, count(*) AS n FROM ms_t3 GROUP BY k")) > 0)
  }

  test("GROUP BY partition answers from directory keys: counts, min/max, DISTINCT") {
    mkTable("ms_t5")
    val grouped = spark.sql("SELECT p, count(*) AS n, min(k) AS mn, " +
      "max(k) AS mx FROM ms_t5 GROUP BY p ORDER BY p")
    assert(scansOf(grouped) == 0, "grouped-by-partition must plan zero scans")
    val rows = grouped.collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.toSeq == Seq(("a", 3L, 1L, 2L), ("b", 2L, 7L, 9L)),
      rows.mkString(","))
    // DISTINCT of the partition column is the same shape
    val distinctP = spark.sql("SELECT DISTINCT p FROM ms_t5 ORDER BY p")
    assert(scansOf(distinctP) == 0, "DISTINCT partition must plan zero scans")
    assert(distinctP.collect().map(_.getString(0)).toSeq == Seq("a", "b"))
    // partition-filtered grouped form: groups decided exactly
    val flt = spark.sql("SELECT p, count(*) AS n FROM ms_t5 " +
      "WHERE p = 'b' GROUP BY p")
    assert(scansOf(flt) == 0)
    assert(flt.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(("b", 2L)))
    // no matching partition: ZERO rows (the SQL GROUP BY answer)
    val none = spark.sql("SELECT p, count(*) AS n FROM ms_t5 " +
      "WHERE p = 'zzz' GROUP BY p")
    assert(scansOf(none) == 0 && none.collect().isEmpty)
    // guards: grouping on a NON-partition column scans; an expression
    // over the partition column scans; count(col) in a grouped form
    // scans
    assert(scansOf(spark.sql(
      "SELECT k, count(*) AS n FROM ms_t5 GROUP BY k")) > 0)
    assert(scansOf(spark.sql(
      "SELECT upper(p) AS u, count(*) AS n FROM ms_t5 GROUP BY upper(p)"))
      > 0)
    assert(scansOf(spark.sql(
      "SELECT p, count(k) AS n FROM ms_t5 GROUP BY p")) > 0)
  }

  test("DESCRIBE DETAIL: one metadata-only row of table facts") {
    val root = mkTable("ms_t6")
    spark.sql("DELETE FROM ms_t6 WHERE k = 9") // v1
    val r = spark.sql("DESCRIBE DETAIL ms_t6").collect().head
    assert(r.getString(0) == "graft")
    assert(r.getString(1).stripPrefix("file:") == root)
    assert(r.getLong(2) == 1L, s"version: $r")
    assert(r.getLong(4) == 4L, s"num_rows: $r")
    assert(r.getLong(3) >= 2L && r.getLong(5) > 0L)
    assert(r.getString(6) == "p" && r.getString(7) == "k")
    assert(r.getLong(8) == 2L, s"retained: $r")
    assert(r.getBoolean(9), "front-door tables are field-id mapped")
  }

  test("stats stay exact across CoW DML and answer time-traveled snapshots") {
    val root = mkTable("ms_t4")
    spark.sql("DELETE FROM ms_t4 WHERE k = 9")
    val head = spark.sql(
      "SELECT count(*) AS n, max(k) AS mx FROM ms_t4")
    assert(scansOf(head) == 0)
    val r = head.collect().head
    assert((r.getLong(0), r.getLong(1)) == ((4L, 7L)))
    // pinned snapshot: the immutable v0 manifest answers
    spark.sql("DROP TABLE IF EXISTS ms_t4v0")
    spark.sql(s"CREATE TABLE ms_t4v0 USING graft " +
      s"OPTIONS (path '$root', version '0')")
    val v0 = spark.sql("SELECT count(*) AS n, max(k) AS mx FROM ms_t4v0")
    assert(scansOf(v0) == 0)
    val r0 = v0.collect().head
    assert((r0.getLong(0), r0.getLong(1)) == ((5L, 9L)))
  }
}
