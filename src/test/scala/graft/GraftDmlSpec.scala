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

  test("SQL MERGE INTO: cascade parity, insert-only fast path, refusals") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mrg").toString
    val root = s"$tmp/cat"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.write.format("graft").option("path", root)
      .option("partitionBy", "event_type").option("clusterBy", "event_id")
      .option("files", "8").mode("errorifexists").save()
    spark.sql("DROP TABLE IF EXISTS mrg_events")
    spark.sql(s"CREATE TABLE mrg_events USING graft OPTIONS (path '$root')")
    ev.createOrReplaceTempView("mrg_src_events")

    // deterministic changeset: updates + flagged deletes on one user
    // cohort, inserts keyed outside the table's id range from another
    spark.sql("""CREATE OR REPLACE TEMP VIEW mrg_chg AS
      SELECT event_id AS k, user_id AS u, event_type AS et,
             value * 3 + 1 AS nv, (event_id % 5 = 0) AS del
      FROM mrg_src_events WHERE user_id BETWEEN 3 AND 9
      UNION ALL
      SELECT event_id + 100000000 AS k, user_id AS u, event_type AS et,
             value + 0.5 AS nv, FALSE AS del
      FROM mrg_src_events WHERE user_id BETWEEN 1 AND 2""")
    val chg = spark.table("mrg_chg").cache()
    assert(chg.where(!col("del")).count() > 0 &&
      chg.where(col("del")).count() > 0 &&
      chg.where(col("k") >= 100000000L).count() > 0,
      "the fixture must exercise update, delete, and insert arms")

    spark.sql("""MERGE INTO mrg_events t USING mrg_chg s ON t.event_id = s.k
      WHEN MATCHED AND s.del THEN DELETE
      WHEN MATCHED THEN UPDATE SET value = s.nv
      WHEN NOT MATCHED THEN INSERT (event_id, user_id, event_type, value)
        VALUES (s.k, s.u, s.et, s.nv)""")
    assert(FileManifest.latestVersion(spark, root).contains(1L),
      "MERGE must commit exactly one new version")

    // expected state, computed independently on plain DataFrames
    val upd = chg.where(col("k") < 100000000L)
    val expected = ev.as("e")
      .join(upd.as("c"), col("e.event_id") === col("c.k"), "left_outer")
      .where(col("c.k").isNull || !col("c.del"))
      .select(col("e.event_id"), col("e.user_id"), col("e.event_type"),
        when(col("c.k").isNotNull, col("c.nv")).otherwise(col("e.value"))
          .as("value"))
      .unionByName(chg.where(col("k") >= 100000000L)
        .select(col("k").as("event_id"), col("u").as("user_id"),
          col("et").as("event_type"), col("nv").as("value")))
    val got = spark.sql("SELECT count(*) AS n, sum(event_id) AS s, " +
      "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v " +
      "FROM mrg_events").head
    val want = expected.agg(count(lit(1)), sum("event_id"),
      sum(col("value").cast("decimal(18,2)")).cast("double")).head
    assert(got.getLong(0) == want.getLong(0), "MERGE row-count parity")
    assert(got.getLong(1) == want.getLong(1), "MERGE id-sum parity")
    assert(math.abs(got.getDouble(2) - want.getDouble(2)) < 1e-6,
      "MERGE value-sum parity")

    // pre-MERGE snapshot still time-travelable
    spark.sql("DROP TABLE IF EXISTS mrg_events_v0")
    spark.sql(s"CREATE TABLE mrg_events_v0 USING graft " +
      s"OPTIONS (path '$root', version '0')")
    assert(spark.sql("SELECT count(*) FROM mrg_events_v0").head.getLong(0)
      == ev.count(), "the pre-MERGE version must read unchanged")

    // insert-only MERGE rewrites NOTHING: every pre-merge file carries
    val before = FileManifest.loadLatest(spark, root)
      .partitions.values.flatten.map(_.path).toSet
    spark.sql("""MERGE INTO mrg_events t
      USING (SELECT event_id + 200000000 AS k, user_id AS u,
               event_type AS et, value AS nv
             FROM mrg_src_events WHERE user_id = 7) s
      ON t.event_id = s.k
      WHEN NOT MATCHED THEN INSERT (event_id, user_id, event_type, value)
        VALUES (s.k, s.u, s.et, s.nv)""")
    assert(FileManifest.latestVersion(spark, root).contains(2L))
    val after = FileManifest.loadLatest(spark, root)
      .partitions.values.flatten.map(_.path).toSet
    assert(before.subsetOf(after),
      "an insert-only MERGE must carry every existing file verbatim")

    // NOT MATCHED BY SOURCE: unmatched target rows take the cascade
    val nBig = spark.sql(
      "SELECT count(*) FROM mrg_events WHERE user_id > 12").head.getLong(0)
    assert(nBig > 0, "fixture needs unmatched rows above the gate")
    spark.sql("""MERGE INTO mrg_events t
      USING (SELECT event_id AS k FROM mrg_src_events WHERE user_id <= 12) s
      ON t.event_id = s.k
      WHEN NOT MATCHED BY SOURCE AND t.user_id > 12 THEN DELETE""")
    assert(spark.sql(
      "SELECT count(*) FROM mrg_events WHERE user_id > 12").head.getLong(0)
      == 0, "BY SOURCE delete must drop exactly the unmatched gated rows")

    // a MERGE matching and inserting nothing is a committed no-op
    val vNow = FileManifest.latestVersion(spark, root).get
    spark.sql("""MERGE INTO mrg_events t
      USING (SELECT -1 AS k) s ON t.event_id = s.k
      WHEN MATCHED THEN DELETE""")
    assert(FileManifest.latestVersion(spark, root).contains(vNow),
      "a no-op MERGE must not commit a version")

    // refusals: cardinality violation (duplicate source keys), key-range
    // updates, time-traveled target — all loud, none committing
    val card = intercept[Throwable] {
      spark.sql("""MERGE INTO mrg_events t
        USING (SELECT event_id AS k, value AS nv FROM mrg_src_events
               WHERE user_id = 3
               UNION ALL
               SELECT event_id AS k, value AS nv FROM mrg_src_events
               WHERE user_id = 3) s
        ON t.event_id = s.k
        WHEN MATCHED THEN UPDATE SET value = s.nv""")
    }
    assert(messages(card).exists(_.contains("cardinality")),
      s"duplicate-key source must refuse: ${messages(card)}")
    // `SET event_id = s.k` under `ON t.event_id = s.k` is a PINNED
    // identity (allowed, drops out); shifting it is a real key move
    val kc = intercept[Throwable] {
      spark.sql("""MERGE INTO mrg_events t USING mrg_chg s
        ON t.event_id = s.k
        WHEN MATCHED THEN UPDATE SET event_id = s.k + 1""")
    }
    assert(messages(kc).exists(_.contains("clustering")),
      s"clustering-column MERGE update must refuse: ${messages(kc)}")
    val tt = intercept[Throwable] {
      spark.sql("""MERGE INTO mrg_events_v0 t USING mrg_chg s
        ON t.event_id = s.k
        WHEN MATCHED THEN UPDATE SET value = s.nv""")
    }
    assert(messages(tt).exists(_.contains("time-traveled")),
      s"MERGE into a pinned snapshot must refuse: ${messages(tt)}")
    assert(FileManifest.latestVersion(spark, root).contains(vNow),
      "refused merges must commit nothing")
    chg.unpersist()
  }

  test("SQL MERGE star actions: UPDATE SET * / INSERT * with a name-aligned source") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-star").toString
    val root = s"$tmp/cat"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.write.format("graft").option("path", root)
      .option("partitionBy", "event_type").option("clusterBy", "event_id")
      .option("files", "8").mode("errorifexists").save()
    spark.sql("DROP TABLE IF EXISTS star_events")
    spark.sql(s"CREATE TABLE star_events USING graft OPTIONS (path '$root')")
    ev.createOrReplaceTempView("star_src")
    // star expansion requires source columns named like the target;
    // the changeset keeps names and flips values/ids deterministically
    spark.sql("""CREATE OR REPLACE TEMP VIEW star_chg AS
      SELECT event_id, user_id, event_type, value * 5 + 2 AS value
      FROM star_src WHERE user_id BETWEEN 4 AND 6
      UNION ALL
      SELECT event_id + 300000000 AS event_id, user_id, event_type,
             value + 0.25 AS value
      FROM star_src WHERE user_id = 11""")
    // the ON clause pins BOTH key columns, so the star expansion's
    // event_id/event_type assignments are provable identities and
    // drop out of the rewrite
    spark.sql("""MERGE INTO star_events t USING star_chg s
      ON t.event_id = s.event_id AND t.event_type = s.event_type
      WHEN MATCHED THEN UPDATE SET *
      WHEN NOT MATCHED THEN INSERT *""")
    assert(FileManifest.latestVersion(spark, root).contains(1L))
    val chg = spark.table("star_chg")
    val expected = ev.as("e")
      .join(chg.where(col("event_id") < 300000000L)
        .select(col("event_id").as("k"), col("value").as("nv")).as("c"),
        col("e.event_id") === col("c.k"), "left_outer")
      .select(col("e.event_id"),
        when(col("c.k").isNotNull, col("c.nv")).otherwise(col("e.value"))
          .as("value"))
      .unionByName(chg.where(col("event_id") >= 300000000L)
        .select(col("event_id"), col("value")))
    val got = spark.sql("SELECT count(*) AS n, sum(event_id) AS s, " +
      "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v " +
      "FROM star_events").head
    val want = expected.agg(count(lit(1)), sum("event_id"),
      sum(col("value").cast("decimal(18,2)")).cast("double")).head
    assert(got.getLong(0) == want.getLong(0), "star row-count parity")
    assert(got.getLong(1) == want.getLong(1), "star id-sum parity")
    assert(math.abs(got.getDouble(2) - want.getDouble(2)) < 1e-6,
      "star value-sum parity")
    // a star update whose ON clause does NOT pin the partition column
    // cannot prove the assignment is an identity — it must refuse
    val kc = intercept[Throwable] {
      spark.sql("""MERGE INTO star_events t USING star_chg s
        ON t.event_id = s.event_id
        WHEN MATCHED THEN UPDATE SET *""")
    }
    assert(messages(kc).exists(_.contains("partition")),
      s"unpinned star partition assignment must refuse: ${messages(kc)}")
  }

  test("SQL OPTIMIZE/VACUUM: layout-only compaction, retention sweep, parser passthrough") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-mnt").toString
    val root = s"$tmp/cat"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.write.format("graft").option("path", root)
      .option("partitionBy", "event_type").option("clusterBy", "user_id")
      .option("files", "16").mode("errorifexists").save()
    spark.sql("DROP TABLE IF EXISTS mnt_events")
    spark.sql(s"CREATE TABLE mnt_events USING graft OPTIONS (path '$root')")
    def files() = FileManifest.loadLatest(spark, root)
      .partitions.values.map(_.size).sum
    def agg() = spark.sql("SELECT count(*), sum(event_id), " +
      "CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) FROM mnt_events")
      .head.toSeq

    // OPTIMIZE: fewer files, identical rows, one atomic version,
    // pre-OPTIMIZE snapshot still time-travelable
    val before = files()
    val aggBefore = agg()
    spark.sql(s"OPTIMIZE mnt_events TARGET ${ev.count() / 3} ROWS")
    assert(FileManifest.latestVersion(spark, root).contains(1L))
    assert(files() < before, s"expected fewer files: $before -> ${files()}")
    assert(agg() == aggBefore, "OPTIMIZE must be pure layout")
    spark.sql("DROP TABLE IF EXISTS mnt_events_v0")
    spark.sql(s"CREATE TABLE mnt_events_v0 USING graft " +
      s"OPTIONS (path '$root', version '0')")
    assert(spark.sql("SELECT count(*) FROM mnt_events_v0").head.getLong(0)
      == ev.count())

    // an already-compact table: OPTIMIZE commits nothing
    spark.sql(s"OPTIMIZE mnt_events TARGET ${ev.count() / 3} ROWS")
    assert(FileManifest.latestVersion(spark, root).contains(1L),
      "a no-op OPTIMIZE must not commit a version")

    // VACUUM: v0's superseded files leave the disk, the table reads on,
    // the expired version is no longer reachable
    val v0Only = FileManifest.loadVersion(spark, root, 0L)
      .partitions.values.flatten.map(_.path).toSet --
      FileManifest.loadVersion(spark, root, 1L)
        .partitions.values.flatten.map(_.path).toSet
    assert(v0Only.nonEmpty)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    spark.sql("VACUUM mnt_events RETAIN 1 VERSIONS")
    assert(v0Only.forall(p =>
      !fs.exists(new org.apache.hadoop.fs.Path(p))),
      "VACUUM must sweep files only the expired version referenced")
    assert(agg() == aggBefore, "VACUUM must never change the live table")
    val gone = intercept[Throwable] {
      spark.sql("DROP TABLE IF EXISTS mnt_gone")
      spark.sql(s"CREATE TABLE mnt_gone USING graft " +
        s"OPTIONS (path '$root', version '0')")
      spark.sql("SELECT count(*) FROM mnt_gone").head
    }
    assert(gone != null, "the expired version must be unreachable")

    // the injected parser delegates everything else untouched
    assert(spark.sql("SELECT 1 + 1").head.getInt(0) == 2)
    intercept[Throwable] { spark.sql("SELECTT 1") }
    val ng = intercept[Throwable] {
      spark.sql("OPTIMIZE mrg_src_events")
    }
    assert(messages(ng).exists(_.contains("not a graft table")) ||
      messages(ng).exists(_.contains("graft")), s"got ${messages(ng)}")
  }
}
