package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileManifest, GraftStreamSource}

/** Partition VALUES containing Hive-escaped characters (':', '/',
  * '=', '%', space) round-trip through the whole front door: the
  * layout writer escapes them into directory names
  * (`p=2024-01-01 12%3A00%3A00`), the catalog keys stay in that
  * on-disk domain, and every decode back to logical values
  * unescapes — read, filter, DISTINCT, metadata-only counts/groups,
  * DELETE/UPDATE routing, and CDC all operate on the values the user
  * wrote (r13 verdict item 1; the timestamp-shaped string partition
  * is the everyday trigger). */
class PartitionEscapeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  private val P1 = "2024-01-01 12:00:00" // ':' + space — timestamp-shaped
  private val P2 = "a/b"                 // '/' — would split a path
  private val P3 = "x=y"                 // '=' — would split the key
  private val P4 = "50%off"              // '%' — the escape char itself

  /** 80 rows, 20 per partition value; cluster k. */
  private def mkTable(name: String): String = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("pe").toString + "/cat"
    val vals = Seq(P1, P2, P3, P4)
    val df = (0 until 80).map { i =>
      (i.toLong, i.toLong * 2, vals(i % 4))
    }.toDF("k", "v", "p")
    df.write.format("graft")
      .option("path", root).option("partitionBy", "p")
      .option("clusterBy", "k").option("files", "2")
      .mode("overwrite").save()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$root')")
    root
  }

  private def scansOf(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r }.size

  test("layout is escaped on disk; values read back unescaped") {
    val root = mkTable("pe_t1")
    val pm = FileManifest.loadLatest(spark, root)
    // the catalog records the writer's ESCAPED directory names
    assert(pm.partitions.keySet.exists(_.contains("%3A")),
      s"expected Hive-escaped ':' in keys: ${pm.partitions.keySet}")
    assert(pm.partitions.keySet.exists(_.contains("%2F")),
      s"expected Hive-escaped '/' in keys: ${pm.partitions.keySet}")
    // ... and the reads serve the LOGICAL values
    val got = spark.sql("SELECT DISTINCT p FROM pe_t1 ORDER BY p")
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(P1, P2, P3, P4).sorted, got.toString)
  }

  test("equality filter and metadata-only count bind on logical values") {
    mkTable("pe_t2")
    for (p <- Seq(P1, P2, P3, P4)) {
      val c = spark.sql(
        s"SELECT count(*) AS n FROM pe_t2 WHERE p = '${p.replace("'", "''")}'")
      assert(scansOf(c) == 0,
        s"partition-equality count must answer from metadata for $p")
      assert(c.collect().head.getLong(0) == 20L, s"count under $p")
    }
    // metadata-only GROUP BY serves the unescaped values too
    val g = spark.sql(
      "SELECT p, count(*) AS n FROM pe_t2 GROUP BY p ORDER BY p")
    assert(scansOf(g) == 0, "GROUP BY partition must be metadata-only")
    assert(g.collect().map(r => (r.getString(0), r.getLong(1))).toSeq ==
      Seq(P1, P2, P3, P4).sorted.map(_ -> 20L))
  }

  test("DELETE and UPDATE route to escaped directories and take effect") {
    mkTable("pe_t3")
    spark.sql(s"DELETE FROM pe_t3 WHERE p = '$P2'") // '/'-bearing leaf
    assert(spark.sql("SELECT count(*) AS n FROM pe_t3")
      .collect().head.getLong(0) == 60L, "DELETE must not silently no-op")
    assert(spark.sql(s"SELECT count(*) AS n FROM pe_t3 WHERE p = '$P2'")
      .collect().head.getLong(0) == 0L)
    spark.sql(s"UPDATE pe_t3 SET v = -1 WHERE p = '$P1' AND k < 8")
    val upd = spark.sql(
      s"SELECT count(*) AS n FROM pe_t3 WHERE v = -1").collect().head
    assert(upd.getLong(0) == 2L, s"UPDATE rows: ${upd.getLong(0)}") // k=0,4
    // untouched partitions carried verbatim
    assert(spark.sql(s"SELECT count(*) AS n FROM pe_t3 WHERE p = '$P4'")
      .collect().head.getLong(0) == 20L)
  }

  test("CDC emits the delete as D rows over the escaped layout") {
    val root = mkTable("pe_t4")
    spark.sql(s"DELETE FROM pe_t4 WHERE p = '$P1' AND k < 8") // v1
    val changes = GraftStreamSource.tableChanges(spark, root, 1L, Some(1L))
      .groupBy("_change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(changes.get("D").contains(2L), s"expected 2 D rows: $changes")
    // the D rows carry the LOGICAL partition value
    val dvals = GraftStreamSource.tableChanges(spark, root, 1L, Some(1L))
      .where("_change_type = 'D'").select("p").distinct()
      .collect().map(_.getString(0)).toSeq
    assert(dvals == Seq(P1), dvals.toString)
  }

  test("OPTIMIZE compacts escaped leaves without corrupting them") {
    mkTable("pe_t5")
    spark.sql("OPTIMIZE pe_t5 TARGET 1000 ROWS")
    val got = spark.sql(
      "SELECT p, count(*) AS n, sum(v) AS s FROM pe_t5 GROUP BY p ORDER BY p")
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got == Seq(P1, P2, P3, P4).sorted.map(_ -> 20L), got.toString)
  }

  test("MERGE matches rows inside an escaped partition") {
    mkTable("pe_t6")
    spark.sql("SELECT CAST(0 AS BIGINT) AS k, CAST(999 AS BIGINT) AS v, " +
      s"'${P1}' AS p").createOrReplaceTempView("pe6_src")
    spark.sql("MERGE INTO pe_t6 t USING pe6_src s ON t.k = s.k AND t.p = s.p " +
      "WHEN MATCHED THEN UPDATE SET v = s.v")
    assert(spark.sql(s"SELECT v FROM pe_t6 WHERE k = 0 AND p = '$P1'")
      .collect().head.getLong(0) == 999L)
    assert(spark.sql("SELECT count(*) AS n FROM pe_t6")
      .collect().head.getLong(0) == 80L)
  }
}
