package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{FileManifest, Tables}

/** SQL-surface row-level DML through the graft front door: DELETE and
  * UPDATE land as atomic CoW versions, pre-DML snapshots stay
  * time-travelable, and the documented footguns refuse loudly. */
class GraftDmlSpec extends AnyFunSuite {
  lazy val spark = {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString
    GraftSession.builder("local[4]", 4)
      .config("spark.sql.warehouse.dir", wh)
      .getOrCreate()
  }

  private def messages(t: Throwable): Seq[String] =
    if (t == null) Nil
    else Option(t.getMessage).toSeq ++ messages(t.getCause)

  test("SQL DELETE/UPDATE: CoW versions, parity, time travel, refusals") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-dml").toString
    val root = s"$tmp/cat"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.write.format("graft").option("path", root)
      .option("partitionBy", "event_type").option("clusterBy", "user_id")
      .option("files", "8").mode("errorifexists").save()
    spark.sql("DROP TABLE IF EXISTS dml_events")
    spark.sql(s"CREATE TABLE dml_events USING graft OPTIONS (path '$root')")
    val total = ev.count()

    // DELETE with a predicate spanning the partition column (directory
    // pruning), the clustering column (file pruning), and a data column
    spark.sql("DELETE FROM dml_events " +
      "WHERE event_type = 'click' AND user_id BETWEEN 3 AND 9 AND value > 5")
    assert(FileManifest.latestVersion(spark, root).contains(1L),
      "DELETE must commit exactly one new version")
    val afterDelete = ev.where(not(coalesce(
      col("event_type") === "click" && col("user_id").between(3, 9) &&
        col("value") > 5, lit(false))))
    assert(spark.sql("SELECT count(*) FROM dml_events").head.getLong(0) ==
      afterDelete.count(), "DELETE must drop exactly the matching rows")
    assert(spark.sql("SELECT sum(event_id) FROM dml_events").head.getLong(0)
      == afterDelete.agg(sum("event_id")).head.getLong(0))

    // the pre-DELETE snapshot is still time-travelable
    spark.sql("DROP TABLE IF EXISTS dml_events_v0")
    spark.sql(s"CREATE TABLE dml_events_v0 USING graft " +
      s"OPTIONS (path '$root', version '0')")
    assert(spark.sql("SELECT count(*) FROM dml_events_v0").head.getLong(0)
      == total, "the pre-DML version must read unchanged")

    // UPDATE: matching rows transform, NULL-condition rows keep theirs
    spark.sql("UPDATE dml_events SET value = value * 10 " +
      "WHERE event_type = 'purchase' AND user_id < 5")
    assert(FileManifest.latestVersion(spark, root).contains(2L))
    val afterUpdate = afterDelete.withColumn("value",
      when(col("event_type") === "purchase" && col("user_id") < 5,
        col("value") * 10).otherwise(col("value")))
    val gotSum = spark.sql(
      "SELECT CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) " +
        "FROM dml_events").head.getDouble(0)
    val wantSum = afterUpdate.agg(
      sum(col("value").cast("decimal(18,2)")).cast("double"))
      .head.getDouble(0)
    assert(math.abs(gotSum - wantSum) < 1e-6,
      s"UPDATE parity: got $gotSum want $wantSum")
    assert(spark.sql("SELECT count(*) FROM dml_events").head.getLong(0) ==
      afterDelete.count(), "UPDATE must not change the row count")

    // a no-match DELETE commits NOTHING (two-phase touch finds no files)
    spark.sql("DELETE FROM dml_events WHERE user_id = 987654321")
    assert(FileManifest.latestVersion(spark, root).contains(2L),
      "a DELETE matching nothing must not commit a version")

    // footguns refuse loudly
    val up = intercept[Throwable] {
      spark.sql("UPDATE dml_events SET user_id = 0 WHERE event_id = 1")
    }
    assert(messages(up).exists(_.contains("clustering")),
      s"clustering-column update must refuse: ${messages(up)}")
    val pp = intercept[Throwable] {
      spark.sql("UPDATE dml_events SET event_type = 'x' WHERE event_id = 1")
    }
    assert(messages(pp).exists(_.contains("partition")),
      s"partition-column update must refuse: ${messages(pp)}")
    val da = intercept[Throwable] {
      spark.sql("DELETE FROM dml_events WHERE true")
    }
    assert(messages(da).exists(_.contains("every row")),
      s"delete-all must refuse (DROP TABLE is the honest spell): ${messages(da)}")
    val tt = intercept[Throwable] {
      spark.sql("DELETE FROM dml_events_v0 WHERE user_id = 1")
    }
    assert(messages(tt).exists(_.contains("time-traveled")),
      s"DML on a pinned snapshot must refuse: ${messages(tt)}")
    // refusals committed nothing
    assert(FileManifest.latestVersion(spark, root).contains(2L))
  }
}
