package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileManifest

/** Write-time CHECK constraints (f45): declared by `ALTER TABLE … ADD
  * CONSTRAINT n CHECK (expr)` (NOT NULL as sugar), committed to the
  * version meta and inherited forward, enforced at every batch-landing
  * seam — a violating batch refuses ATOMICALLY (nothing
  * partial-lands), and the constraint survives schema evolution. */
class ConstraintsSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  private def mkTable(name: String): String = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("cst").toString + "/cat"
    // the non-foldable `when` marks v NULLABLE (a tuple-derived Long
    // column is non-nullable, and Spark's own NOT_NULL assert would
    // then fire before the graft constraint gate ever sees a NULL;
    // a foldable condition gets simplified away at analysis)
    val df = (0 until 40).map(i =>
      (i.toLong, i.toLong * 2, if (i % 2 == 0) "x" else "y"))
      .toDF("k", "v", "p")
      .select(col("k"), when(col("k") >= 0, col("v")).as("v"), col("p"))
    df.write.format("graft")
      .option("path", root).option("partitionBy", "p")
      .option("clusterBy", "k").option("files", "2")
      .mode("overwrite").save()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$root')")
    root
  }

  private def rowCount(t: String): Long =
    spark.sql(s"SELECT count(*) AS n FROM $t").collect().head.getLong(0)

  test("ADD CONSTRAINT validates existing rows; commits and persists") {
    val root = mkTable("cst_t1")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE cst_t1 ADD CONSTRAINT v_big CHECK (v > 10)") }
    assert(e.getMessage.contains("existing row"), e.getMessage)
    assert(FileManifest.constraintsAt(spark, root).isEmpty,
      "a refused constraint must not commit")
    spark.sql("ALTER TABLE cst_t1 ADD CONSTRAINT v_ok CHECK (v >= 0)")
    assert(FileManifest.constraintsAt(spark, root) ==
      Seq("v_ok" -> "v >= 0"))
    // inherited forward across an unrelated commit
    spark.sql("DELETE FROM cst_t1 WHERE k = 0")
    assert(FileManifest.constraintsAt(spark, root) ==
      Seq("v_ok" -> "v >= 0"), "constraints must inherit forward")
  }

  test("INSERT violating refuses atomically; valid INSERT lands") {
    mkTable("cst_t2")
    spark.sql("ALTER TABLE cst_t2 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO cst_t2 SELECT CAST(100 AS BIGINT), " +
        "CAST(-5 AS BIGINT), 'x'") }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    assert(rowCount("cst_t2") == 40L, "refused INSERT must land NOTHING")
    spark.sql("INSERT INTO cst_t2 SELECT CAST(100 AS BIGINT), " +
      "CAST(5 AS BIGINT), 'x'")
    assert(rowCount("cst_t2") == 41L, "valid INSERT must still land")
  }

  test("writer append violating refuses; UPDATE gated; DELETE exempt") {
    import spark.implicits._
    val root = mkTable("cst_t3")
    spark.sql("ALTER TABLE cst_t3 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    val e1 = intercept[Exception] {
      Seq((200L, -1L, "x")).toDF("k", "v", "p").write.format("graft")
        .option("path", root).option("partitionBy", "p")
        .option("clusterBy", "k").mode("append").save() }
    assert(e1.getMessage.contains("v_pos"), e1.getMessage)
    assert(rowCount("cst_t3") == 40L)
    val e2 = intercept[Exception] {
      spark.sql("UPDATE cst_t3 SET v = -10 WHERE k = 2") }
    assert(e2.getMessage.contains("v_pos"), e2.getMessage)
    assert(spark.sql("SELECT v FROM cst_t3 WHERE k = 2")
      .collect().head.getLong(0) == 4L, "refused UPDATE must not land")
    spark.sql("UPDATE cst_t3 SET v = 1000 WHERE k = 2") // valid
    spark.sql("DELETE FROM cst_t3 WHERE k = 4") // deletes never violate
    assert(rowCount("cst_t3") == 39L)
  }

  test("MERGE violating refuses atomically") {
    import spark.implicits._
    mkTable("cst_t4")
    spark.sql("ALTER TABLE cst_t4 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    Seq((2L, -7L, "x"), (500L, 1L, "x")).toDF("k", "v", "p")
      .createOrReplaceTempView("cst4_src")
    val e = intercept[Exception] {
      spark.sql("MERGE INTO cst_t4 t USING cst4_src s ON t.k = s.k " +
        "WHEN MATCHED THEN UPDATE SET v = s.v " +
        "WHEN NOT MATCHED THEN INSERT (k, v, p) VALUES (s.k, s.v, s.p)") }
    assert(e.getMessage.contains("v_pos"), e.getMessage)
    assert(rowCount("cst_t4") == 40L, "refused MERGE must land NOTHING")
    assert(spark.sql("SELECT v FROM cst_t4 WHERE k = 2")
      .collect().head.getLong(0) == 4L)
  }

  test("NOT NULL sugar; NULL passes plain CHECK but fails IS NOT NULL") {
    mkTable("cst_t5")
    spark.sql("ALTER TABLE cst_t5 ALTER COLUMN v SET NOT NULL")
    val e = intercept[Exception] {
      spark.sql("INSERT INTO cst_t5 SELECT CAST(300 AS BIGINT), " +
        "CAST(NULL AS BIGINT), 'x'") }
    assert(e.getMessage.contains("v_not_null"), e.getMessage)
    // a NULL under a plain arithmetic CHECK passes (SQL: only FALSE
    // violates) — drop the NOT NULL first, add the plain check
    spark.sql("ALTER TABLE cst_t5 DROP CONSTRAINT v_not_null")
    spark.sql("ALTER TABLE cst_t5 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    spark.sql("INSERT INTO cst_t5 SELECT CAST(300 AS BIGINT), " +
      "CAST(NULL AS BIGINT), 'x'")
    assert(rowCount("cst_t5") == 41L, "NULL must pass a plain CHECK")
  }

  test("survives schema evolution; DROP/RENAME of referenced column refuses") {
    mkTable("cst_t6")
    spark.sql("ALTER TABLE cst_t6 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    spark.sql("ALTER TABLE cst_t6 ADD COLUMN w BIGINT")
    val e1 = intercept[Exception] {
      spark.sql("INSERT INTO cst_t6 SELECT CAST(400 AS BIGINT), " +
        "CAST(-1 AS BIGINT), CAST(9 AS BIGINT), 'x'") }
    assert(e1.getMessage.contains("v_pos"),
      s"constraint must survive ADD COLUMN: ${e1.getMessage}")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE cst_t6 DROP COLUMN v") }
    assert(e2.getMessage.contains("v_pos"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE cst_t6 RENAME COLUMN v TO v2") }
    assert(e3.getMessage.contains("v_pos"), e3.getMessage)
    spark.sql("ALTER TABLE cst_t6 DROP CONSTRAINT v_pos")
    spark.sql("ALTER TABLE cst_t6 RENAME COLUMN v TO v2") // now fine
    assert(spark.sql("SELECT sum(v2) AS s FROM cst_t6")
      .collect().head.getLong(0) == (0 until 40).map(_ * 2L).sum)
  }

  test("streaming sink gate: a violating micro-batch fails the query, lands nothing") {
    import spark.implicits._
    val root = mkTable("cst_t7")
    spark.sql("ALTER TABLE cst_t7 ADD CONSTRAINT v_pos CHECK (v >= 0)")
    val tmp = java.nio.file.Files.createTempDirectory("cst7").toString
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, Long, String)]
    in.addData((900L, -3L, "x"))
    val q = in.toDF().toDF("k", "v", "p")
      .writeStream.format("graft")
      .option("path", root).option("partitionBy", "p")
      .option("clusterBy", "k")
      .option("checkpointLocation", s"$tmp/ckpt")
      .outputMode("append").start()
    val err = intercept[org.apache.spark.sql.streaming
      .StreamingQueryException] { q.processAllAvailable(); q.stop() }
    assert(err.getMessage.contains("v_pos") ||
      Option(err.getCause).exists(_.getMessage.contains("v_pos")),
      s"the sink must refuse the violating batch: ${err.getMessage}")
    assert(rowCount("cst_t7") == 40L, "nothing may partial-land")
  }
}
