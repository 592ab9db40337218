package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileManifest

/** FIELD-ID column mapping (f37) — the Iceberg identity discipline on
  * the graft substrate. Layer 1 pins the raw Spark parquet semantics
  * the design rests on (SPARK-38094 surface); layer 2 drives the full
  * front door: RENAME COLUMN across old/new files, the r12 VERDICT's
  * exact drop-then-re-add resurrection repro (must read all-NULL now),
  * epoch time travel across a rename, and DML crossing a rename. */
class FieldIdSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  private def md(id: Int) =
    new MetadataBuilder().putLong("parquet.field.id", id).build()

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private def parquetSchemaOf(dir: String) = {
    val conf = spark.sparkContext.hadoopConfiguration
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(conf)
    val f = fs.listStatus(p).toSeq
      .filter(_.getPath.getName.endsWith(".parquet")).head.getPath
    val rd = org.apache.parquet.hadoop.ParquetFileReader.open(
      org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(f, conf))
    try rd.getFooter.getFileMetaData.getSchema finally rd.close()
  }

  // ---- layer 1: the Spark parquet field-id substrate ----------------

  test("substrate: write embeds ids; id-matched read renames and null-masks") {
    import spark.implicits._
    val dir = tmp("fid")
    val df = Seq((1L, 100L), (2L, 200L), (3L, 300L)).toDF("k", "c")
      .select(col("k").as("k", md(1)), col("c").as("c", md(2)))
    df.write.mode("overwrite").parquet(s"$dir/t")
    assert(parquetSchemaOf(s"$dir/t").getFields.get(0).getId != null,
      "writer must embed field ids")

    // rename: request name 'renamed' with id 2 -> serves the old values
    val renamed = StructType(Seq(
      StructField("k", LongType, nullable = true, md(1)),
      StructField("renamed", LongType, nullable = true, md(2))))
    val got = FileManifest.pinnedReader(spark, renamed).parquet(s"$dir/t")
      .orderBy("k").select("renamed").as[Long].collect().toSeq
    assert(got == Seq(100L, 200L, 300L), s"rename read got $got")

    // re-add: SAME name 'c' but a NEW id 7 -> NULL, never the old bytes
    val readd = StructType(Seq(
      StructField("k", LongType, nullable = true, md(1)),
      StructField("c", LongType, nullable = true, md(7))))
    val got2 = FileManifest.pinnedReader(spark, readd).parquet(s"$dir/t")
      .select("c").collect().map(_.isNullAt(0)).toSeq
    assert(got2 == Seq(true, true, true), s"re-add read got $got2")
  }

  // ---- layer 2: the front door -------------------------------------

  /** A small front-door table: partition `p` (a/b), cluster `k`,
    * payload `c` — returns the catalog root. */
  private def mkTable(name: String): String = {
    import spark.implicits._
    val root = s"${tmp("fidcat")}/cat"
    val df = Seq(
      (1L, 100L, "a"), (2L, 200L, "a"), (3L, 300L, "b"), (4L, 400L, "b"))
      .toDF("k", "c", "p")
    df.write.format("graft")
      .option("path", root).option("partitionBy", "p")
      .option("clusterBy", "k").option("files", "2")
      .mode("overwrite").save()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$root')")
    root
  }

  test("front door CREATE commits an id-mapped schema; files carry ids") {
    val root = mkTable("fid_t1")
    val s = FileManifest.schemaAt(spark, root).get
    assert(FileManifest.hasFieldIds(s), s"no ids in $s")
    assert(FileManifest.schemaMaxFieldId(s) == 2L) // k, c (p is directory)
    val pm = FileManifest.loadLatest(spark, root)
    val anyDir = new org.apache.hadoop.fs.Path(
      pm.partitions.valuesIterator.flatten.next().path).getParent.toString
    val ps = parquetSchemaOf(anyDir)
    assert(ps.getFields.get(0).getId != null, s"file lacks ids: $ps")
  }

  test("VERDICT r12 repro: DROP COLUMN c; ADD COLUMN c reads all-NULL") {
    mkTable("fid_t2")
    spark.sql("ALTER TABLE fid_t2 DROP COLUMN c")
    spark.sql("ALTER TABLE fid_t2 ADD COLUMN c BIGINT")
    val got = spark.sql("SELECT c FROM fid_t2").collect()
    assert(got.length == 4)
    assert(got.forall(_.isNullAt(0)),
      s"resurrected values: ${got.map(_.get(0)).mkString(",")} — the " +
        "re-added column must read as a FRESH (all-NULL) column")
  }

  test("RENAME COLUMN: old files resolve by id; epoch travel reads both names") {
    val root = mkTable("fid_t3")
    spark.sql("ALTER TABLE fid_t3 RENAME COLUMN c TO amount") // v1
    // head: old files' values under the new name
    val head = spark.sql(
      "SELECT k, amount FROM fid_t3 ORDER BY k").collect()
    assert(head.map(_.getLong(1)).toSeq == Seq(100L, 200L, 300L, 400L),
      s"rename must serve old files' values by id, got ${head.toSeq}")
    // pre-rename epoch still reads the OLD name, same bytes
    val pre = spark.sql(
      "SELECT k, c FROM fid_t3 VERSION AS OF 0 ORDER BY k").collect()
    assert(pre.map(_.getLong(1)).toSeq == Seq(100L, 200L, 300L, 400L))
    // ... and refuses the new name at the old epoch
    intercept[Exception] {
      spark.sql("SELECT amount FROM fid_t3 VERSION AS OF 0").collect()
    }
    // id is unchanged across the rename
    val s = FileManifest.schemaAt(spark, root).get
    assert(FileManifest.fieldIdOf(s.fields.find(_.name == "amount").get)
      .contains(2L))
  }

  test("INSERT + UPDATE after a rename: new files carry the new name, reads stay uniform") {
    val root = mkTable("fid_t4")
    spark.sql("ALTER TABLE fid_t4 RENAME COLUMN c TO amount") // v1
    spark.sql("SELECT 9 AS k, CAST(900 AS BIGINT) AS amount, 'b' AS p")
      .createOrReplaceTempView("fid_t4_src")
    spark.sql("INSERT INTO fid_t4 SELECT * FROM fid_t4_src") // v2
    spark.sql("UPDATE fid_t4 SET amount = amount + 1 WHERE k = 1") // v3
    val got = spark.sql("SELECT k, amount FROM fid_t4 ORDER BY k")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got == Seq((1L, 101L), (2L, 200L), (3L, 300L), (4L, 400L),
      (9L, 900L)), s"got $got")
    // the UPDATE's rewritten file must physically carry the NEW name
    // with the SAME id (DML upgrades what it touches)
    assert(FileManifest.latestVersion(spark, root).contains(3L))
  }

  test("OPTIMIZE across a rename compacts old+new files under the id map") {
    mkTable("fid_t5")
    spark.sql("ALTER TABLE fid_t5 RENAME COLUMN c TO amount")
    spark.sql("SELECT 9 AS k, CAST(900 AS BIGINT) AS amount, 'a' AS p")
      .createOrReplaceTempView("fid_t5_src")
    spark.sql("INSERT INTO fid_t5 SELECT * FROM fid_t5_src")
    spark.sql("OPTIMIZE fid_t5") // bins mix pre- and post-rename files
    val got = spark.sql("SELECT sum(amount) AS s FROM fid_t5").collect()
    assert(got.head.getLong(0) == 1900L, s"got ${got.toSeq}")
  }

  test("rename refuses on key columns and keeps epoch DML guards") {
    mkTable("fid_t6")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE fid_t6 RENAME COLUMN k TO kk") }
    assert(e1.getMessage.contains("clustering column"))
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE fid_t6 RENAME COLUMN p TO pp") }
    assert(e2.getMessage.contains("partition column"))
    // renaming onto an existing name refuses
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE fid_t6 RENAME COLUMN c TO k") }
    assert(e3.getMessage.contains("clustering column"))
  }

  test("pre-field-id table: re-ADD of a dropped name refuses loudly") {
    import spark.implicits._
    // build a LEGACY catalog: raw-API commit, no schema meta, no ids
    val root = s"${tmp("fidleg")}/cat"
    val df = Seq((1L, 10L, 5L, "a"), (2L, 20L, 6L, "b"))
      .toDF("k", "c", "d", "p")
    FileManifest.writePartitionedLayout(df, s"$root/data/b0", "p", "k", 1)
    val pm = FileManifest.buildPartitioned(spark, s"$root/data/b0", "k")
    FileManifest.commitVersion(spark, pm, root)
    spark.sql("DROP TABLE IF EXISTS fid_leg")
    spark.sql(s"CREATE TABLE fid_leg USING graft OPTIONS (path '$root')")
    assert(!FileManifest.hasFieldIds(
      spark.table("fid_leg").schema), "legacy table must stay id-less")
    spark.sql("ALTER TABLE fid_leg DROP COLUMN c")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE fid_leg ADD COLUMN c BIGINT") }
    assert(e.getMessage.contains("resurrect"),
      s"wrong refusal: ${e.getMessage}")
    // a FRESH name still adds fine on the legacy table
    spark.sql("ALTER TABLE fid_leg ADD COLUMN c2 BIGINT")
    assert(spark.table("fid_leg").columns.contains("c2"))
    // ... and RENAME refuses with the id-mapping pointer
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE fid_leg RENAME COLUMN d TO dd") }
    assert(e2.getMessage.contains("field-id"),
      s"wrong refusal: ${e2.getMessage}")
  }

  test("UPGRADE FIELD IDS migrates a legacy table: rename unlocks, values carry") {
    import spark.implicits._
    // legacy catalog: raw-API commit, no schema meta, no ids
    val root = s"${tmp("fidup")}/cat"
    val df = Seq((1L, 100L, "a"), (2L, 200L, "a"), (3L, 300L, "b"))
      .toDF("k", "c", "p")
    FileManifest.writePartitionedLayout(df, s"$root/data/b0", "p", "k", 1)
    val pm = FileManifest.buildPartitioned(spark, s"$root/data/b0", "k")
    FileManifest.commitVersion(spark, pm, root)
    spark.sql("DROP TABLE IF EXISTS fid_up")
    spark.sql(s"CREATE TABLE fid_up USING graft OPTIONS (path '$root')")
    // premise: the legacy table refuses RENAME
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE fid_up RENAME COLUMN c TO amount") }
    assert(e.getMessage.contains("field-id"))
    val filesBefore = FileManifest.loadLatest(spark, root)
      .partitions.valuesIterator.flatten.size
    spark.sql("ALTER TABLE fid_up UPGRADE FIELD IDS") // v1: one-job CoW
    val head = FileManifest.loadLatest(spark, root)
    assert(FileManifest.hasFieldIds(FileManifest.schemaAt(spark, root).get))
    assert(head.partitions.valuesIterator.flatten.size == filesBefore,
      "identity rewrite must keep the per-file layout")
    assert(FileManifest.latestVersion(spark, root).contains(1L))
    // values carry bit-for-bit; v0 stays readable id-less
    assert(spark.sql("SELECT sum(c) AS s FROM fid_up")
      .collect().head.getLong(0) == 600L)
    assert(spark.sql("SELECT sum(c) AS s FROM fid_up VERSION AS OF 0")
      .collect().head.getLong(0) == 600L)
    // the upgrade UNLOCKS rename — old (upgraded) files resolve by id
    spark.sql("ALTER TABLE fid_up RENAME COLUMN c TO amount")
    val got = spark.sql("SELECT k, amount FROM fid_up ORDER BY k")
      .collect().map(_.getLong(1)).toSeq
    assert(got == Seq(100L, 200L, 300L), s"got $got")
    // idempotent: a second upgrade is a no-op (no new version)
    spark.sql("ALTER TABLE fid_up UPGRADE FIELD IDS")
    assert(FileManifest.latestVersion(spark, root).contains(2L),
      "re-upgrade must not commit (v2 is the rename)")
  }

  test("SHALLOW CLONE carries the schema epoch and the id map") {
    val root = mkTable("fid_t7")
    spark.sql("ALTER TABLE fid_t7 RENAME COLUMN c TO amount")
    val cloneLoc = s"${tmp("fidclone")}/clone"
    spark.sql("DROP TABLE IF EXISTS fid_t7c")
    spark.sql(s"CREATE TABLE fid_t7c SHALLOW CLONE fid_t7 " +
      s"LOCATION '$cloneLoc'")
    // the clone reads the renamed column from the SOURCE's files by id
    val got = spark.sql("SELECT sum(amount) AS s FROM fid_t7c").collect()
    assert(got.head.getLong(0) == 1000L, s"got ${got.toSeq}")
    assert(FileManifest.hasFieldIds(
      FileManifest.schemaAt(spark, cloneLoc).get))
    // the source records the clone; VACUUM refuses without FORCE
    assert(FileManifest.recordedClones(spark, root) == Seq(cloneLoc))
    val e = intercept[Exception] { spark.sql("VACUUM fid_t7") }
    assert(e.getMessage.contains("clone"), s"wrong refusal: ${e.getMessage}")
  }

  test("VACUUM FORCE on a cloned source reclaims; the clone then fails loudly, not wrongly") {
    val root = mkTable("fid_t8")
    val cloneLoc = s"${tmp("fidclone8")}/clone"
    spark.sql("DROP TABLE IF EXISTS fid_t8c")
    spark.sql(s"CREATE TABLE fid_t8c SHALLOW CLONE fid_t8 " +
      s"LOCATION '$cloneLoc'")
    // advance the source past the cloned snapshot, then FORCE-vacuum
    spark.sql("DELETE FROM fid_t8 WHERE k <= 2") // CoW: v1 replaces files
    spark.sql("VACUUM fid_t8 RETAIN 1 VERSIONS FORCE")
    assert(spark.sql("SELECT count(*) AS n FROM fid_t8")
      .collect().head.getLong(0) == 2L, "source stays readable")
    // the clone references reclaimed files: loud failure, never silence
    // (refreshTable itself may re-resolve eagerly and throw — both are
    // the loud path)
    val e = intercept[Exception] {
      spark.catalog.refreshTable("fid_t8c")
      spark.sql("SELECT * FROM fid_t8c").collect() }
    assert(e.getMessage.contains("missing") ||
      e.getMessage.toLowerCase.contains("filenotfound") ||
      e.getMessage.contains("does not exist"),
      s"expected a loud missing-file failure, got: ${e.getMessage}")
  }
}
