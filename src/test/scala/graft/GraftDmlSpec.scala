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

  test("repeated INSERT INTO the same partition: every batch lands (no catalog-tracked custom-location bypass)") {
    // r14 regression: Spark registers each inserted partition in the
    // session catalog at <tableLocation>/<part>; the NEXT insert into
    // that partition then saw a "custom partition location" and moved
    // its files there directly — bypassing staging, never adopted, a
    // SILENT zero-row insert. GraftDmlRule now drops the tracking
    // flag from graft insert commands.
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft-ins2").toString + "/cat"
    (0 until 20).map(i => (i.toLong, i.toLong, if (i % 2 == 0) "x" else "y"))
      .toDF("k", "v", "p")
      .write.format("graft").option("path", root)
      .option("partitionBy", "p").option("clusterBy", "k")
      .option("files", "2").mode("overwrite").save()
    spark.sql("DROP TABLE IF EXISTS ins2_t")
    spark.sql(s"CREATE TABLE ins2_t USING graft OPTIONS (path '$root')")
    for (i <- 0 until 3) {
      spark.sql(s"INSERT INTO ins2_t SELECT CAST(${100 + i} AS BIGINT), " +
        s"CAST($i AS BIGINT), 'x'")
      assert(spark.sql("SELECT count(*) AS n FROM ins2_t")
        .collect().head.getLong(0) == 21L + i,
        s"insert ${i + 1} into the same partition must land")
    }
    // and nothing leaked into the table location outside the data tree
    assert(!new java.io.File(s"$root/p=x").exists,
      "no insert may write directly under the table root")
  }

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

  test("SQL time travel, table_changes, DESCRIBE HISTORY, CTAS") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-tt").toString
    val root = s"$tmp/cat"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.write.format("graft").option("path", root)
      .option("partitionBy", "event_type").option("clusterBy", "user_id")
      .option("files", "4").mode("errorifexists").save()
    spark.sql("DROP TABLE IF EXISTS tt_events")
    spark.sql(s"CREATE TABLE tt_events USING graft OPTIONS (path '$root')")
    val total = ev.count()

    // CTAS drives the same CreatableRelationProvider as the writer:
    // the query result IS version 0 of the new table
    spark.sql("DROP TABLE IF EXISTS tt_ctas")
    spark.sql(s"""CREATE TABLE tt_ctas USING graft
      OPTIONS (path '$tmp/ctas', partitionBy 'event_type',
               clusterBy 'user_id', files '4')
      AS SELECT * FROM tt_events WHERE user_id < 5""")
    assert(FileManifest.latestVersion(spark, s"$tmp/ctas").contains(0L))
    assert(spark.sql("SELECT count(*) FROM tt_ctas").head.getLong(0)
      == ev.where(col("user_id") < 5).count())
    // CTAS onto an existing table refuses (ErrorIfExists all the way)
    intercept[Throwable] {
      spark.sql(s"""CREATE TABLE tt_ctas USING graft
        OPTIONS (path '$tmp/ctas', partitionBy 'event_type',
                 clusterBy 'user_id')
        AS SELECT * FROM tt_events""")
    }

    // v1: CoW DELETE; v2: plain append (INSERT INTO keeps the session
    // relation fresh — an external writer would need REFRESH TABLE)
    spark.sql("DELETE FROM tt_events WHERE user_id % 7 = 3")
    val afterDelete = ev.where(col("user_id") % 7 =!= 3).count()
    spark.sql("INSERT INTO tt_events " + // table order: partition col last
      "SELECT event_id + 1000000, user_id, value, event_type " +
      "FROM tt_ctas WHERE user_id < 2")
    val appended = ev.where(col("user_id") < 2).count()
    assert(FileManifest.latestVersion(spark, root).contains(2L))

    // VERSION AS OF reaches every committed snapshot; head is live
    def n(sql: String) = spark.sql(sql).head.getLong(0)
    assert(n("SELECT count(*) FROM tt_events VERSION AS OF 0") == total)
    assert(n("SELECT count(*) FROM tt_events VERSION AS OF 1") == afterDelete)
    assert(n("SELECT count(*) FROM tt_events VERSION AS OF 2")
      == afterDelete + appended)
    assert(n("SELECT count(*) FROM tt_events") == afterDelete + appended)
    // two versions of ONE table join in one statement
    assert(n("""SELECT count(*) FROM tt_events VERSION AS OF 0 a
      JOIN tt_events VERSION AS OF 1 b ON a.event_id = b.event_id""")
      == afterDelete)

    // TIMESTAMP AS OF: the v0 commit instant serves v0; a timestamp
    // before every commit refuses loudly; non-literals refuse
    val t0 = FileManifest.versionHistory(spark, root).head._2
    val ts0 = new java.sql.Timestamp(t0).toInstant.toString
      .replace("T", " ").replace("Z", "")
    assert(n(s"SELECT count(*) FROM tt_events TIMESTAMP AS OF '$ts0'")
      == total)
    val past = intercept[Throwable] {
      spark.sql("SELECT count(*) FROM tt_events " +
        "TIMESTAMP AS OF '1990-01-01 00:00:00'").head
    }
    assert(messages(past).exists(_.contains("predates")), messages(past))
    intercept[Throwable] {
      spark.sql("SELECT count(*) FROM tt_events " +
        "TIMESTAMP AS OF current_timestamp()").head
    }

    // non-graft relations pass through to Spark's own refusal
    ev.limit(5).write.mode("overwrite").parquet(s"$tmp/plain")
    spark.sql("DROP TABLE IF EXISTS tt_plain")
    spark.sql(s"CREATE TABLE tt_plain USING parquet LOCATION '$tmp/plain'")
    val sparkOwn = intercept[Throwable] {
      spark.sql("SELECT count(*) FROM tt_plain VERSION AS OF 0").head
    }
    assert(messages(sparkOwn).exists(_.contains("TIME_TRAVEL")),
      messages(sparkOwn))

    // table_changes: the full range folds to the live table; the [1,1]
    // sub-range is exactly the delete's D rows; out-of-range refuses
    val full = spark.sql("SELECT * FROM table_changes('tt_events', 0)")
    val folded = full.where(col("_change_type") === "I").count() -
      full.where(col("_change_type") === "D").count()
    assert(folded == afterDelete + appended,
      s"full change feed must fold to the live count: $folded")
    val d1 = spark.sql("SELECT * FROM table_changes('tt_events', 1, 1)")
    assert(d1.where(col("_change_type") === "D").count()
      == total - afterDelete)
    assert(d1.where(col("_change_type") === "I").count() == 0L,
      "an all-deleted rewrite emits no I rows")
    val oor = intercept[Throwable] {
      spark.sql("SELECT * FROM table_changes('tt_events', 1, 99)").head
    }
    assert(messages(oor).exists(_.contains("not committed")), messages(oor))
    ev.limit(3).createOrReplaceTempView("tt_not_graft")
    val ntg = intercept[Throwable] {
      spark.sql("SELECT * FROM table_changes('tt_not_graft', 0)").head
    }
    assert(messages(ntg).exists(_.contains("not a graft")), messages(ntg))

    // DESCRIBE HISTORY: manifest-only audit of the retained chain,
    // each version labeled with the operation that committed it
    val hist = spark.sql("DESCRIBE HISTORY tt_events")
      .orderBy("version").collect()
    assert(hist.length == 3)
    assert(hist.map(_.getString(1)).toSeq
      == Seq("create", "delete", "insert"),
      s"operation labels: ${hist.map(_.getString(1)).toSeq}")
    assert(hist(0).getLong(2) == total && hist(0).getBoolean(8))
    assert(hist(1).getLong(2) == afterDelete && !hist(1).getBoolean(8),
      "the CoW delete version must not read as appended")
    assert(hist(1).getLong(5) - hist(1).getLong(4) == total - afterDelete,
      "v1 row churn must equal the deleted count")
    assert(hist(2).getLong(2) == afterDelete + appended
      && hist(2).getLong(4) == appended && hist(2).getBoolean(8))

    // RESTORE: rollback lands as a NEW commit; the mistake version
    // stays readable between the original and the restored head
    spark.sql("RESTORE TABLE tt_events TO VERSION AS OF 0")
    assert(n("SELECT count(*) FROM tt_events") == total)
    assert(n("SELECT count(*) FROM tt_events VERSION AS OF 1")
      == afterDelete, "history must stay intact across RESTORE")
    val rhist = spark.sql("DESCRIBE HISTORY tt_events")
      .orderBy("version").collect()
    assert(rhist.length == 4 && rhist(3).getString(1) == "restore")
    // after retention, history shows only what travel can still reach
    spark.sql("VACUUM tt_events RETAIN 1 VERSIONS")
    assert(spark.sql("DESCRIBE HISTORY tt_events").count() == 1L)
  }

  test("SHALLOW CLONE: zero-copy fork, write independence, vacuum safety") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-cln").toString
    val root = s"$tmp/cat"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    def save(df: org.apache.spark.sql.DataFrame, mode: String): Unit =
      df.write.format("graft").option("path", root)
        .option("partitionBy", "event_type").option("clusterBy", "user_id")
        .option("files", "4").mode(mode).save()
    save(ev.where(col("user_id") < 8), "overwrite") // v0
    save(ev.where(col("user_id") >= 8), "append") // v1
    spark.sql("DROP TABLE IF EXISTS cln_src")
    spark.sql(s"CREATE TABLE cln_src USING graft OPTIONS (path '$root')")
    val v0Count = ev.where(col("user_id") < 8).count()
    val fullCount = ev.count()

    // the clone is ZERO-COPY: its v0 manifest points at SOURCE files
    spark.sql("DROP TABLE IF EXISTS cln_fork")
    spark.sql("CREATE TABLE cln_fork SHALLOW CLONE cln_src " +
      s"VERSION AS OF 0 LOCATION '$tmp/fork'")
    val forkFiles = FileManifest.loadVersion(spark, s"$tmp/fork", 0L)
      .partitions.values.flatten.map(_.path).toSeq
    assert(forkFiles.nonEmpty && forkFiles.forall(_.contains(root)),
      "the clone's v0 must reference the source's data files verbatim")
    assert(spark.sql("SELECT count(*) FROM cln_fork").head.getLong(0)
      == v0Count)

    // writes to the clone land under ITS root; the source is untouched
    spark.sql("DELETE FROM cln_fork WHERE event_type = 'view'")
    assert(FileManifest.latestVersion(spark, root).contains(1L),
      "clone DML must not advance the source's version chain")
    assert(spark.sql("SELECT count(*) FROM cln_src").head.getLong(0)
      == fullCount, "the source must still serve its full head")

    // the clone's VACUUM sweeps only its own data root — source files
    // it retired from its head must SURVIVE on disk (the source's v0
    // still references them)
    spark.sql("VACUUM cln_fork RETAIN 1 VERSIONS")
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    assert(forkFiles.forall(p =>
      fs.exists(new org.apache.hadoop.fs.Path(p))),
      "VACUUM on a clone must never delete source data files")
    assert(spark.sql("SELECT count(*) FROM cln_src").head.getLong(0)
      == fullCount)

    // refusals: an occupied target, a non-graft source
    val dup = intercept[Throwable] {
      spark.sql("CREATE TABLE cln_dup SHALLOW CLONE cln_src " +
        s"LOCATION '$tmp/fork'")
    }
    assert(messages(dup).exists(_.contains("already has a committed")),
      messages(dup))
    ev.limit(3).createOrReplaceTempView("cln_not_graft")
    val ng = intercept[Throwable] {
      spark.sql("CREATE TABLE cln_ng SHALLOW CLONE cln_not_graft " +
        s"LOCATION '$tmp/ng'")
    }
    assert(messages(ng).exists(_.contains("not a graft")), messages(ng))

    // an occupied TARGET NAME refuses BEFORE the clone catalog commits
    // — otherwise the stranded catalog would make every retry fail
    // with "already has a committed catalog" (the ADVICE trap)
    val nameTaken = intercept[Throwable] {
      spark.sql("CREATE TABLE cln_src SHALLOW CLONE cln_src " +
        s"LOCATION '$tmp/taken'")
    }
    assert(messages(nameTaken).exists(_.contains("already exists")),
      messages(nameTaken))
    assert(FileManifest.latestVersion(spark, s"$tmp/taken").isEmpty,
      "a refused clone must not leave a committed catalog behind")
    // …and the location can be retried under a fresh name
    spark.sql("DROP TABLE IF EXISTS cln_retry")
    spark.sql("CREATE TABLE cln_retry SHALLOW CLONE cln_src " +
      s"LOCATION '$tmp/taken'")
    assert(spark.sql("SELECT count(*) FROM cln_retry").head.getLong(0)
      == fullCount)
  }

  test("ALTER TABLE ADD COLUMN: catalog-tracked evolution, epoch-correct travel, DML upgrades") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-alt").toString
    val root = s"$tmp/cat"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.where(col("user_id") < 8).write.format("graft").option("path", root)
      .option("partitionBy", "event_type").option("clusterBy", "user_id")
      .option("files", "2").mode("errorifexists").save()
    spark.sql("DROP TABLE IF EXISTS alt_events")
    spark.sql(s"CREATE TABLE alt_events USING graft OPTIONS (path '$root')")
    val old = ev.where(col("user_id") < 8).count()

    // the ALTER commits a labeled version; reads null-fill old files
    spark.sql("ALTER TABLE alt_events ADD COLUMN bonus BIGINT")
    assert(FileManifest.latestVersion(spark, root).contains(1L))
    assert(spark.table("alt_events").columns.contains("bonus"))
    assert(spark.sql("SELECT count(*) FROM alt_events WHERE bonus IS NULL")
      .head.getLong(0) == old, "pre-evolution rows must read NULL")

    // INSERT carries the column for real
    ev.where(col("user_id") >= 8)
      .select(col("event_id"), col("user_id"), col("value"),
        (col("user_id") * 10).as("bonus"), col("event_type"))
      .createOrReplaceTempView("alt_src")
    spark.sql("INSERT INTO alt_events SELECT * FROM alt_src")
    val ins = ev.where(col("user_id") >= 8).count()
    assert(spark.sql("SELECT count(bonus) FROM alt_events")
      .head.getLong(0) == ins)

    // time travel BEFORE the evolution serves the pre-evolution schema
    val v0 = spark.sql("SELECT * FROM alt_events VERSION AS OF 0")
    assert(!v0.columns.contains("bonus"),
      "a pre-evolution snapshot must serve its own schema epoch")
    assert(v0.count() == old)

    // DML across the evolution: the pinned-read rewrite UPGRADES the
    // pre-evolution files it touches (backfill through plain SQL)
    spark.sql("UPDATE alt_events SET bonus = 7 WHERE user_id = 2")
    val n2 = ev.where(col("user_id") === 2).count()
    assert(spark.sql(
      "SELECT count(*) FROM alt_events WHERE bonus = 7").head.getLong(0)
      == n2)
    spark.sql("DELETE FROM alt_events WHERE user_id = 3")
    val n3 = ev.where(col("user_id") === 3).count()
    assert(spark.sql("SELECT count(*) FROM alt_events").head.getLong(0)
      == old + ins - n3)

    // OPTIMIZE compacts the mixed pre/post-evolution layout
    val aggBefore = spark.sql(
      "SELECT count(*), count(bonus), sum(bonus) FROM alt_events")
      .head.toSeq
    spark.sql(s"OPTIMIZE alt_events TARGET ${old + ins} ROWS")
    assert(spark.sql(
      "SELECT count(*), count(bonus), sum(bonus) FROM alt_events")
      .head.toSeq == aggBefore, "compaction must be pure layout")

    // the change feed crosses the evolution (old rows null-filled)
    val feed = spark.sql("SELECT * FROM table_changes('alt_events', 0, 2)")
    assert(feed.where(col("_graft_version") === 0).count() == old)
    assert(feed.where(col("_graft_version") === 2
      && col("bonus").isNotNull).count() == ins)

    // refusals: duplicate column, the partition column, time travel
    val dup = intercept[Throwable] {
      spark.sql("ALTER TABLE alt_events ADD COLUMN bonus BIGINT")
    }
    assert(messages(dup).exists(_.contains("already exists")), messages(dup))
    val pc = intercept[Throwable] {
      spark.sql("ALTER TABLE alt_events ADD COLUMN event_type STRING")
    }
    assert(pc != null)
    // non-graft ALTER passes through to Spark's own handling
    val sparkOwn = intercept[Throwable] {
      spark.sql("ALTER TABLE alt_src ADD COLUMN zz INT")
    }
    assert(messages(sparkOwn).exists(_.contains("EXPECT_TABLE_NOT_VIEW")),
      messages(sparkOwn))

    // multi-column ADD COLUMNS commits as ONE schema version — the
    // form that previously fell through to Spark's native ALTER and
    // desynchronized the session catalog from the manifest schema
    val vBefore = FileManifest.latestVersion(spark, root).get
    spark.sql(
      "ALTER TABLE alt_events ADD COLUMNS (tag STRING, score DECIMAL(10,2))")
    assert(FileManifest.latestVersion(spark, root).contains(vBefore + 1),
      "one ADD COLUMNS statement = one evolution version")
    val cols = spark.table("alt_events").columns.toSet
    assert(cols.contains("tag") && cols.contains("score"), cols)
    assert(spark.sql("SELECT count(tag) FROM alt_events").head.getLong(0)
      == 0L, "new columns null-fill everywhere")
    // decorated forms REFUSE loudly instead of silently reaching
    // Spark's native ALTER (which would desynchronize the catalog)
    val deco = intercept[Throwable] {
      spark.sql("ALTER TABLE alt_events ADD COLUMN note STRING COMMENT 'x'")
    }
    assert(messages(deco).exists(_.contains("unsupported column definition")),
      messages(deco))
    assert(!spark.table("alt_events").columns.contains("note"))
  }

  test("ALTER TABLE DROP COLUMN: lazy catalog drop, epoch-correct travel, DML sheds bytes, refusals") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-drop").toString
    val root = s"$tmp/cat"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    ev.write.format("graft").option("path", root)
      .option("partitionBy", "event_type").option("clusterBy", "user_id")
      .option("files", "3").mode("errorifexists").save()
    spark.sql("DROP TABLE IF EXISTS drp_events")
    spark.sql(s"CREATE TABLE drp_events USING graft OPTIONS (path '$root')")
    val total = ev.count()

    spark.sql("ALTER TABLE drp_events DROP COLUMN value") // v1
    assert(FileManifest.latestVersion(spark, root).contains(1L),
      "the drop must commit exactly one (metadata-only) version")
    assert(!spark.table("drp_events").columns.contains("value"),
      "head reads must project the dropped column away")
    assert(spark.sql("SELECT count(*) FROM drp_events").head.getLong(0)
      == total, "the drop must not touch a single row")
    // time travel BEFORE the drop serves the wide epoch
    val v0 = spark.sql("SELECT * FROM drp_events VERSION AS OF 0")
    assert(v0.columns.contains("value"),
      "a pre-drop snapshot must serve its own (wide) schema epoch")
    // post-drop DML rewrites physically shed the column from the
    // files they touch (the pinned-read upgrade discipline)
    spark.sql("DELETE FROM drp_events WHERE user_id = 2")
    val v2 = FileManifest.loadVersion(spark, root, 2L)
    val v0files = FileManifest.loadVersion(spark, root, 0L)
      .partitions.values.flatten.map(_.path).toSet
    val rewritten = v2.partitions.values.flatten
      .map(_.path).filterNot(v0files).toSeq
    assert(rewritten.nonEmpty, "the DELETE must have rewritten files")
    val rewrittenCols = spark.read.parquet(rewritten: _*).columns.toSet
    assert(!rewrittenCols.contains("value"),
      s"rewritten files must physically shed the dropped column: " +
        s"$rewrittenCols")
    // INSERT after the drop validates against the narrowed schema
    ev.limit(5).select((col("event_id") + 900000000L).as("event_id"),
        col("user_id"), col("event_type"))
      .createOrReplaceTempView("drp_src")
    spark.sql("INSERT INTO drp_events SELECT * FROM drp_src")
    assert(spark.sql("SELECT count(*) FROM drp_events").head.getLong(0)
      == total - ev.where(col("user_id") === 2).count() + 5)

    // refusals: partition column, clustering column, unknown column,
    // and the schema mutations the catalog cannot represent
    val pc = intercept[Throwable] {
      spark.sql("ALTER TABLE drp_events DROP COLUMN event_type") }
    assert(messages(pc).exists(_.contains("partition column")), messages(pc))
    val cc = intercept[Throwable] {
      spark.sql("ALTER TABLE drp_events DROP COLUMN user_id") }
    assert(messages(cc).exists(_.contains("clustering column")), messages(cc))
    val nx = intercept[Throwable] {
      spark.sql("ALTER TABLE drp_events DROP COLUMN nope") }
    assert(messages(nx).exists(_.contains("does not exist")), messages(nx))
    // RENAME is now SUPPORTED on the field-id substrate (r13, f37 —
    // FieldIdSpec pins the epoch semantics); the still-unrepresentable
    // mutations keep refusing
    spark.sql("ALTER TABLE drp_events RENAME COLUMN event_id TO eid")
    assert(spark.table("drp_events").columns.contains("eid"))
    val rc = intercept[Throwable] {
      spark.sql("ALTER TABLE drp_events REPLACE COLUMNS (x INT)") }
    assert(messages(rc).exists(_.contains("not supported")), messages(rc))
  }

  test("MERGE WITH SCHEMA EVOLUTION: new source columns land, null-fill, type changes refuse") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-mev").toString
    val root = s"$tmp/cat"
    val base = (0L until 100L).map(i =>
      (i, i % 10, if (i % 2 == 0) "click" else "view", i.toDouble))
      .toDF("event_id", "user_id", "event_type", "value")
    base.write.format("graft").option("path", root)
      .option("partitionBy", "event_type").option("clusterBy", "event_id")
      .option("files", "4").mode("errorifexists").save()
    spark.sql("DROP TABLE IF EXISTS mev_events")
    spark.sql(s"CREATE TABLE mev_events USING graft OPTIONS (path '$root')")
    // name-aligned wider source: updates for even ids < 20, inserts
    // beyond the key range, plus the NEW column `score`
    base.where(col("event_id") < 20 && col("event_id") % 2 === 0)
      .select(col("event_id"), col("user_id"), col("event_type"),
        (col("value") * 10).as("value"), (col("event_id") + 1000).as("score"))
      .unionByName(
        base.limit(3).select((col("event_id") + 5000).as("event_id"),
          col("user_id"), col("event_type"), col("value"),
          lit(-1L).as("score")))
      .createOrReplaceTempView("mev_chg")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mev_events t
      |USING mev_chg s
      |ON t.event_id = s.event_id AND t.event_type = s.event_type
      |WHEN MATCHED THEN UPDATE SET *
      |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(FileManifest.latestVersion(spark, root).contains(2L),
      "expected add-column + merge versions")
    val t = spark.table("mev_events")
    assert(t.columns.contains("score"), "the evolution must add `score`")
    assert(t.where(col("score").isNotNull).count() == 10 + 3,
      "matched updates + inserts carry the new column")
    assert(t.count() == 103, "100 base rows + 3 inserts")
    assert(t.where(col("score").isNull).count() == 90,
      "unmatched target rows null-fill")
    assert(t.where(col("event_id") === 4).head.getAs[Long]("score")
      == 1004L)
    // the evolution is a REAL catalog epoch: pre-merge travel is wide-
    // free, and DESCRIBE HISTORY shows the add-column + merge pair
    assert(!spark.sql("SELECT * FROM mev_events VERSION AS OF 0")
      .columns.contains("score"))
    val hist = spark.sql("DESCRIBE HISTORY mev_events")
      .select("version", "operation").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(hist(1L) == "add-column" && hist(2L) == "merge", hist)
    // a same-name TYPE change refuses loudly (the kept f32 boundary)
    base.limit(2).select(col("event_id"), col("user_id"),
        col("event_type"), col("value").cast("string").as("value"))
      .createOrReplaceTempView("mev_bad")
    val bad = intercept[Throwable] {
      spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO mev_events t
        |USING mev_bad s
        |ON t.event_id = s.event_id AND t.event_type = s.event_type
        |WHEN MATCHED THEN UPDATE SET value = s.value""".stripMargin)
    }
    assert(messages(bad).exists(_.contains("cannot CHANGE column types")),
      messages(bad))
  }

  test("ALTER COLUMN TYPE widening: upcast reads, wide writes, epoch travel, refusals") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-wide").toString
    val root = s"$tmp/cat"
    val base = (0L until 60L).map(i =>
      (i, i % 6, if (i % 2 == 0) "a" else "b", (i * 3).toInt))
      .toDF("id", "k", "p", "score")
    base.write.format("graft").option("path", root)
      .option("partitionBy", "p").option("clusterBy", "k")
      .option("files", "2").mode("errorifexists").save() // score INT32
    spark.sql("DROP TABLE IF EXISTS wid_events")
    spark.sql(s"CREATE TABLE wid_events USING graft OPTIONS (path '$root')")
    assert(spark.table("wid_events").schema("score").dataType
      == org.apache.spark.sql.types.IntegerType)

    spark.sql("ALTER TABLE wid_events ALTER COLUMN score TYPE BIGINT")
    assert(FileManifest.latestVersion(spark, root).contains(1L),
      "the widen must commit exactly one metadata-only version")
    assert(spark.table("wid_events").schema("score").dataType
      == org.apache.spark.sql.types.LongType)
    // old INT32 files upcast in place: values preserved
    assert(spark.sql("SELECT sum(score) FROM wid_events").head.getLong(0)
      == (0L until 60L).map(_ * 3).sum)
    // new writes carry values only BIGINT can hold
    // table column order = data schema (id, k, score) + partition (p)
    Seq((1000L, 1L, 5000000000L, "a")).toDF("id", "k", "score", "p")
      .createOrReplaceTempView("wid_src")
    spark.sql("INSERT INTO wid_events SELECT * FROM wid_src")
    assert(spark.sql("SELECT max(score) FROM wid_events").head.getLong(0)
      == 5000000000L)
    // a DML rewrite crosses the widening (pinned wide read upgrades)
    spark.sql("UPDATE wid_events SET score = score + 1 WHERE k = 2")
    val n2 = 10 // ids with k = 2
    assert(spark.sql("SELECT sum(score) FROM wid_events").head.getLong(0)
      == (0L until 60L).map(_ * 3).sum + n2 + 5000000000L)
    // pre-widening travel serves the narrow epoch
    assert(spark.sql("SELECT * FROM wid_events VERSION AS OF 0")
      .schema("score").dataType
      == org.apache.spark.sql.types.IntegerType)
    // OPTIMIZE compacts the mixed INT32/INT64 layout under the pin
    val aggBefore = spark.sql(
      "SELECT count(*), sum(score) FROM wid_events").head.toSeq
    spark.sql("OPTIMIZE wid_events TARGET 1000000 ROWS")
    assert(spark.sql("SELECT count(*), sum(score) FROM wid_events")
      .head.toSeq == aggBefore, "compaction must be pure layout")

    // refusals: narrowing, non-widenable, key columns
    val nar = intercept[Throwable] {
      spark.sql("ALTER TABLE wid_events ALTER COLUMN score TYPE INT") }
    assert(messages(nar).exists(_.contains("widenings")), messages(nar))
    val str = intercept[Throwable] {
      spark.sql("ALTER TABLE wid_events ALTER COLUMN id TYPE STRING") }
    assert(messages(str).exists(_.contains("widenings")), messages(str))
    val key = intercept[Throwable] {
      spark.sql("ALTER TABLE wid_events ALTER COLUMN k TYPE DOUBLE") }
    assert(messages(key).exists(_.contains("clustering")), messages(key))
    // other ALTER COLUMN decorations still refuse loudly
    val deco = intercept[Throwable] {
      spark.sql("ALTER TABLE wid_events ALTER COLUMN score COMMENT 'x'") }
    assert(messages(deco).exists(_.contains("not supported")), messages(deco))
  }

  test("metadata COUNT(*): zero-scan answer, maintained across DML; guarded forms still scan") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-cnt").toString
    val root = s"$tmp/cat"
    val base = (0L until 300L).map(i =>
      (i, i % 10, if (i % 2 == 0) "a" else "b",
        if (i % 5 == 0) null else s"v$i"))
      .toDF("id", "k", "p", "tag")
    base.write.format("graft").option("path", root)
      .option("partitionBy", "p").option("clusterBy", "k")
      .option("files", "3").mode("errorifexists").save()
    spark.sql("DROP TABLE IF EXISTS cnt_events")
    spark.sql(s"CREATE TABLE cnt_events USING graft OPTIONS (path '$root')")
    // count RELATION SCANS in the optimized logical plan — the
    // physical executedPlan hides its tree inside AdaptiveSparkPlanExec
    // (collect would vacuously find nothing either way)
    def scansOf(df: org.apache.spark.sql.DataFrame): Int =
      df.queryExecution.optimizedPlan.collect {
        case r: org.apache.spark.sql.execution.datasources
          .LogicalRelation => r
      }.size
    val c0 = spark.sql("SELECT count(*) FROM cnt_events")
    assert(scansOf(c0) == 0, "count(*) must answer from the manifest")
    assert(c0.head.getLong(0) == 300L)
    // maintained across the whole DML lifecycle
    spark.sql("DELETE FROM cnt_events WHERE k = 3")
    Seq((900L, 1L, "x9", "a")).toDF("id", "k", "tag", "p")
      .createOrReplaceTempView("cnt_src")
    spark.sql("INSERT INTO cnt_events SELECT * FROM cnt_src")
    spark.sql("OPTIMIZE cnt_events TARGET 1000000 ROWS")
    val c1 = spark.sql("SELECT count(*) FROM cnt_events")
    assert(scansOf(c1) == 0)
    assert(c1.head.getLong(0) == 300L - 30L + 1L,
      "manifest counts must survive DELETE + INSERT + OPTIMIZE")
    // the guarded forms still SCAN and still answer correctly:
    // count(col) sees NULLs, a filter restricts, grouping groups
    val cc = spark.sql("SELECT count(tag) FROM cnt_events")
    assert(scansOf(cc) == 1, "count(col) must not take the metadata path")
    assert(cc.head.getLong(0) ==
      spark.table("cnt_events").where(col("tag").isNotNull).count())
    val cf = spark.sql("SELECT count(*) FROM cnt_events WHERE k = 1")
    assert(scansOf(cf) == 1, "a filtered count must not take it either")
    assert(cf.head.getLong(0) == 30L + 1L)
    // grouped by the PARTITION column: metadata-answerable since r13
    // (f41 — the groups ARE the directory keys); grouped by a data
    // column still scans
    val cg = spark.sql(
      "SELECT p, count(*) FROM cnt_events GROUP BY p ORDER BY p")
    assert(scansOf(cg) == 0,
      "a partition-grouped count answers from the manifest")
    assert(cg.collect().map(_.getLong(1)).sum == 271L)
    val cgd = spark.sql(
      "SELECT k, count(*) FROM cnt_events GROUP BY k")
    assert(scansOf(cgd) == 1, "a data-grouped count must scan")
    // time travel answers from the PINNED snapshot's manifest
    val cv = spark.sql("SELECT count(*) FROM cnt_events VERSION AS OF 0")
    assert(scansOf(cv) == 0 && cv.head.getLong(0) == 300L)
  }

  test("DESCRIBE HISTORY distributed path == driver fold, row for row") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-hist").toString
    val root = s"$tmp/cat"
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    def save(df: org.apache.spark.sql.DataFrame, mode: String): Unit =
      df.write.format("graft").option("path", root)
        .option("partitionBy", "event_type").option("clusterBy", "user_id")
        .option("files", "2").mode(mode).save()
    save(ev.where(col("user_id") < 8), "overwrite") // v0
    spark.sql("DROP TABLE IF EXISTS hist_events")
    spark.sql(s"CREATE TABLE hist_events USING graft OPTIONS (path '$root')")
    spark.sql("DELETE FROM hist_events WHERE user_id % 3 = 1") // v1: churn
    save(ev.where(col("user_id") >= 8), "append") // v2: append
    spark.sql("OPTIMIZE hist_events TARGET 1000000 ROWS") // v3: rewrite
    val idx = graft.plans.GraftMaintenance.indexOf(spark, "hist_events")
    val viaDriver = graft.plans.GraftMaintenance.history(spark, idx,
      planThreshold = Long.MaxValue)
    val viaJob = graft.plans.GraftMaintenance.history(spark, idx,
      planThreshold = 0L)
    assert(viaDriver == viaJob,
      s"the two planning paths must answer identically:\n" +
        s"driver: $viaDriver\njob:    $viaJob")
    assert(viaDriver.size == 4 && viaDriver.map(_._2) ==
      Seq("create", "delete", "append", "optimize"), viaDriver)
  }

  test("DML rewrite is ONE distributed job: Spark job count flat in touched-file count") {
    val ev = Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select("event_id", "user_id", "event_type", "value")
    // two tables, identical rows, different file counts — the same
    // broad DELETE touches ~2 files on one and ~12 on the other; with
    // the per-file Future fan-out the job counts differed by ~10,
    // with the single distributed rewrite they differ by at most the
    // footer-stat job the >8-file table adds
    def setup(name: String, files: Int): String = {
      val tmp = java.nio.file.Files.createTempDirectory(s"graft-1j$name")
        .toString
      val root = s"$tmp/cat"
      ev.write.format("graft").option("path", root)
        .option("partitionBy", "event_type").option("clusterBy", "user_id")
        .option("files", files.toString).mode("errorifexists").save()
      spark.sql(s"DROP TABLE IF EXISTS onejob_$name")
      spark.sql(s"CREATE TABLE onejob_$name USING graft " +
        s"OPTIONS (path '$root')")
      root
    }
    val rootSmall = setup("small", 2)
    val rootBig = setup("big", 12)
    def jobsDuring(body: => Unit): Int = {
      val counter = new java.util.concurrent.atomic.AtomicInteger(0)
      val l = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          counter.incrementAndGet()
      }
      spark.sparkContext.addSparkListener(l)
      // job-start events post asynchronously; drain before reading
      try { body; Thread.sleep(1000) }
      finally spark.sparkContext.removeSparkListener(l)
      counter.get()
    }
    val del = "WHERE user_id BETWEEN 2 AND 9 AND value > 1"
    val jSmall = jobsDuring(spark.sql(s"DELETE FROM onejob_small $del"))
    val jBig = jobsDuring(spark.sql(s"DELETE FROM onejob_big $del"))
    val v0Big = FileManifest.loadVersion(spark, rootBig, 0L)
      .partitions.values.flatten.map(_.path).toSet
    val headBig = FileManifest.loadLatest(spark, rootBig)
      .partitions.values.flatten.map(_.path).toSet
    val nTouched = (v0Big -- headBig).size
    assert(nTouched >= 8,
      s"test premise: the big table's DELETE must touch many files " +
        s"($nTouched)")
    assert(jBig <= jSmall + 2,
      s"rewrite phase must be O(1) jobs, not O(touched files): " +
        s"small-table DELETE ran $jSmall jobs, big-table ($nTouched " +
        s"touched) ran $jBig")
    // both DELETEs produced the same table content
    assert(spark.sql("SELECT sum(event_id), count(*) FROM onejob_small")
      .head.toSeq ==
      spark.sql("SELECT sum(event_id), count(*) FROM onejob_big")
        .head.toSeq)
  }

  test("optimistic DML commit: a concurrent append and a DELETE both land") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graft-race").toString
    val root = s"$tmp/cat"
    val base = (0L until 400L).map(i =>
      (i, i % 10, if (i % 2 == 0) "click" else "view", (i % 7).toDouble))
      .toDF("event_id", "user_id", "event_type", "value")
    base.write.format("graft").option("path", root)
      .option("partitionBy", "event_type").option("clusterBy", "user_id")
      .option("files", "4").mode("errorifexists").save()
    spark.sql("DROP TABLE IF EXISTS race_events")
    spark.sql(s"CREATE TABLE race_events USING graft OPTIONS (path '$root')")
    // appended rows do NOT match the DELETE predicate, so the final
    // table equals SEQUENTIAL application in either order — the
    // commute the optimistic retry is allowed to exploit
    val appended = (1000L until 1040L).map(i =>
      (i, 999L, "purchase", 1.0))
      .toDF("event_id", "user_id", "event_type", "value")
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    val fDel = Future {
      spark.sql("DELETE FROM race_events WHERE user_id BETWEEN 2 AND 7")
    }
    val fApp = Future {
      appended.write.format("graft").option("path", root)
        .option("partitionBy", "event_type").option("clusterBy", "user_id")
        .option("files", "1").mode("append").save()
    }
    Await.result(Future.sequence(Seq(fDel, fApp)), 5.minutes)
    assert(FileManifest.latestVersion(spark, root).contains(2L),
      "both the DELETE and the append must land as versions")
    // re-resolve the table to read the final head regardless of which
    // writer's snapshot the cached relation last advanced to
    spark.sql("DROP TABLE IF EXISTS race_check")
    spark.sql(s"CREATE TABLE race_check USING graft OPTIONS (path '$root')")
    val want = base.where(!col("user_id").between(2, 7))
      .unionByName(appended)
      .agg(count(lit(1)), sum("event_id")).head.toSeq
    val got = spark.sql(
      "SELECT count(*), sum(event_id) FROM race_check").head.toSeq
    assert(got == want,
      s"final table must equal sequential application: got $got, want $want")
  }
}
