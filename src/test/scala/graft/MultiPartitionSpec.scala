package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileManifest, GraftStreamSource}

/** Multi-column (Hive-nested) partitioning through the front door
  * (f40): two directory levels, predicates on either/both columns
  * decide whole leaves exactly, and the full lifecycle — INSERT, CoW
  * DML, OPTIMIZE, time travel, CDC, metadata-only counts — runs over
  * the two-level layout. */
class MultiPartitionSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  /** (k, v, p, b): partition (p, b) with p in {a,b}, b in {0,1};
    * cluster k. 400 rows, 100 per leaf. */
  private def mkTable(name: String): String = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("mp").toString + "/cat"
    val df = (0 until 400).map { i =>
      (i.toLong, i.toLong * 2, if (i % 2 == 0) "a" else "b", (i / 2) % 2)
    }.toDF("k", "v", "p", "b")
    df.write.format("graft")
      .option("path", root).option("partitionBy", "p,b")
      .option("clusterBy", "k").option("files", "2")
      .mode("overwrite").save()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$root')")
    root
  }

  private def scansOf(df: DataFrame): Int =
    df.queryExecution.optimizedPlan.collect {
      case r: LogicalRelation => r }.size

  test("two-level layout on disk; reads restore both partition columns") {
    val root = mkTable("mp_t1")
    val fs = new org.apache.hadoop.fs.Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val pm = FileManifest.loadLatest(spark, root)
    assert(pm.partitions.keySet ==
      Set("p=a/b=0", "p=a/b=1", "p=b/b=0", "p=b/b=1"), pm.partitions.keySet)
    pm.partitions.values.flatten.foreach(f =>
      assert(fs.exists(new org.apache.hadoop.fs.Path(f.path))))
    val got = spark.sql("SELECT p, b, count(*) AS n FROM mp_t1 " +
      "GROUP BY p, b ORDER BY p, b").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2))).toSeq
    assert(got == Seq(("a", 0, 100L), ("a", 1, 100L),
      ("b", 0, 100L), ("b", 1, 100L)), got.toString)
  }

  test("predicates on either or both partition columns prune leaves exactly (zero-scan counts)") {
    mkTable("mp_t2")
    // the metadata rule answers ONLY when the directory decision is
    // exact — a zero-scan plan IS the proof both levels bind
    val both = spark.sql(
      "SELECT count(*) AS n FROM mp_t2 WHERE p = 'a' AND b = 1")
    assert(scansOf(both) == 0, "two-column partition filter must be " +
      "metadata-answerable")
    assert(both.collect().head.getLong(0) == 100L)
    val second = spark.sql("SELECT count(*) AS n FROM mp_t2 WHERE b = 0")
    assert(scansOf(second) == 0)
    assert(second.collect().head.getLong(0) == 200L)
    // data predicate still scans and still answers right
    val mixed = spark.sql(
      "SELECT count(*) AS n FROM mp_t2 WHERE p = 'a' AND k < 10")
    assert(scansOf(mixed) > 0)
    assert(mixed.collect().head.getLong(0) == 5L)
  }

  test("INSERT, DELETE, UPDATE, OPTIMIZE, time travel over two levels") {
    val root = mkTable("mp_t3")
    spark.sql("SELECT CAST(9999 AS BIGINT) AS k, CAST(1 AS BIGINT) AS v, " +
      "'a' AS p, 1 AS b").createOrReplaceTempView("mp_src")
    spark.sql("INSERT INTO mp_t3 SELECT * FROM mp_src") // v1
    spark.sql("DELETE FROM mp_t3 WHERE k % 100 = 7") // v2: CoW, many leaves
    spark.sql("UPDATE mp_t3 SET v = v + 1 WHERE k = 0") // v3
    spark.sql("OPTIMIZE mp_t3 TARGET 1000 ROWS") // v4: per-leaf bins
    val n = spark.sql("SELECT count(*) AS n, sum(v) AS s FROM mp_t3")
      .collect().head
    // 400 + 1 insert - 4 deletes (7, 107, 207, 307); sum adjusts by
    // +1 (insert v=1) +1 (update) - (14+214+414+614)
    assert(n.getLong(0) == 397L, s"rows: ${n.getLong(0)}")
    val expectedSum = (0 until 400).map(_ * 2L).sum + 1L + 1L -
      (14L + 214L + 414L + 614L)
    assert(n.getLong(1) == expectedSum, s"sum: ${n.getLong(1)}")
    // v0 unchanged
    assert(spark.sql("SELECT count(*) AS n FROM mp_t3 VERSION AS OF 0")
      .collect().head.getLong(0) == 400L)
    // partition-pruned read post-OPTIMIZE stays exact
    assert(spark.sql(
      "SELECT count(*) AS n FROM mp_t3 WHERE p = 'b' AND b = 1")
      .collect().head.getLong(0) ==
      spark.sql("SELECT count(*) AS n FROM mp_t3 " +
        "WHERE p = 'b' AND b = 1 AND k >= 0")
        .collect().head.getLong(0))
  }

  test("CDC (table_changes) over a two-level layout: appends and CoW diffs") {
    val root = mkTable("mp_t4")
    spark.sql("SELECT CAST(9999 AS BIGINT) AS k, CAST(1 AS BIGINT) AS v, " +
      "'b' AS p, 0 AS b").createOrReplaceTempView("mp4_src")
    spark.sql("INSERT INTO mp_t4 SELECT * FROM mp4_src") // v1: append
    spark.sql("DELETE FROM mp_t4 WHERE k = 3") // v2: CoW rewrite
    val changes = GraftStreamSource.tableChanges(spark, root, 1L, Some(2L))
      .groupBy("_graft_version", "_change_type").count()
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(changes((1L, "I")) == 1L, s"insert row as I: $changes")
    assert(changes((2L, "D")) == 1L, s"deleted row as D: $changes")
    assert(!changes.contains((2L, "I")),
      s"carried rows must cancel in the diff: $changes")
  }

  test("refusals hold per level: partition-column UPDATE/DROP/RENAME/ZORDER") {
    mkTable("mp_t5")
    val e1 = intercept[Exception] {
      spark.sql("UPDATE mp_t5 SET b = 1 WHERE k = 0") }
    assert(e1.getMessage.contains("partition"), e1.getMessage)
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE mp_t5 DROP COLUMN b") }
    assert(e2.getMessage.contains("partition column"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE mp_t5 RENAME COLUMN p TO q") }
    assert(e3.getMessage.contains("partition column"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql("OPTIMIZE mp_t5 ZORDER BY (b, k)") }
    assert(e4.getMessage.contains("partition column"), e4.getMessage)
    // clusterBy overlapping partitionBy refuses at write time
    import spark.implicits._
    val e5 = intercept[Exception] {
      Seq((1L, "a", 0)).toDF("k", "p", "b").write.format("graft")
        .option("path", java.nio.file.Files
          .createTempDirectory("mp5").toString + "/cat")
        .option("partitionBy", "p,b").option("clusterBy", "b")
        .mode("overwrite").save() }
    assert(e5.getMessage.contains("cannot also be a partition column"))
  }
}
