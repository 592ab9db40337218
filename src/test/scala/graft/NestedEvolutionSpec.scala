package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileManifest

/** Nested-field schema evolution on the field-id substrate (f43):
  * ADD/RENAME/DROP of struct subfields, with the same identity
  * guarantees as top level — renamed subfields keep their id (old
  * bytes keep resolving), dropped-then-re-added names mint a fresh id
  * (nothing resurrects — the f33 defect class, nested), and DML
  * crossing a nested evolution re-stamps nested ids into the files it
  * rewrites. */
class NestedEvolutionSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  /** k BIGINT (cluster), v BIGINT, p STRING (partition),
    * s STRUCT<a INT, b STRING>. */
  private def mkTable(name: String): String = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("ne").toString + "/cat"
    val df = (0 until 40).map { i =>
      (i.toLong, i.toLong * 2, if (i % 2 == 0) "x" else "y", i, s"s$i")
    }.toDF("k", "v", "p", "sa", "sb")
      .select(col("k"), col("v"), col("p"),
        struct(col("sa").as("a"), col("sb").as("b")).as("s"))
    df.write.format("graft")
      .option("path", root).option("partitionBy", "p")
      .option("clusterBy", "k").option("files", "2")
      .mode("overwrite").save()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$root')")
    root
  }

  private def idOf(st: StructType, path: String*): Option[Long] = {
    def walk(t: StructType, p: Seq[String]): Option[Long] = {
      val f = t(t.fieldIndex(p.head))
      if (p.tail.isEmpty) FileManifest.fieldIdOf(f)
      else walk(f.dataType.asInstanceOf[StructType], p.tail)
    }
    walk(st, path.toSeq)
  }

  test("CREATE assigns nested field ids, DFS, none reused") {
    val root = mkTable("ne_t1")
    val s = FileManifest.schemaAt(spark, root).get
    val ids = Seq(idOf(s, "k"), idOf(s, "s"),
      idOf(s, "s", "a"), idOf(s, "s", "b")).flatten
    assert(ids.size == 4, s"all fields need ids: $s")
    assert(ids.distinct.size == 4, s"ids must be unique: $ids")
    assert(FileManifest.schemaMaxFieldId(s) == ids.max)
  }

  test("ADD nested field: old rows null-fill, new INSERT carries it") {
    mkTable("ne_t2")
    spark.sql("ALTER TABLE ne_t2 ADD COLUMN s.c DOUBLE")
    assert(spark.sql("SELECT count(*) AS n FROM ne_t2 WHERE s.c IS NULL")
      .collect().head.getLong(0) == 40L, "pre-evolution rows null-fill")
    spark.sql("INSERT INTO ne_t2 SELECT CAST(100 AS BIGINT) AS k, " +
      "CAST(0 AS BIGINT) AS v, " +
      "named_struct('a', 7, 'b', 'nb', 'c', CAST(1.5 AS DOUBLE)) AS s, " +
      "'x' AS p")
    val got = spark.sql("SELECT s.a, s.c FROM ne_t2 WHERE k = 100")
      .collect().head
    assert(got.getInt(0) == 7 && got.getDouble(1) == 1.5)
    assert(spark.sql("SELECT count(*) AS n FROM ne_t2 WHERE s.c IS NOT NULL")
      .collect().head.getLong(0) == 1L)
  }

  test("RENAME nested field: id kept, old files' bytes resolve") {
    val root = mkTable("ne_t3")
    val idBefore = idOf(FileManifest.schemaAt(spark, root).get, "s", "a").get
    spark.sql("ALTER TABLE ne_t3 RENAME COLUMN s.a TO alpha")
    val after = FileManifest.schemaAt(spark, root).get
    assert(idOf(after, "s", "alpha").contains(idBefore),
      "rename must keep the field id")
    // the data was written pre-rename — values must resolve by id
    assert(spark.sql("SELECT sum(s.alpha) AS t FROM ne_t3")
      .collect().head.getLong(0) == (0 until 40).sum.toLong)
    // time travel BEFORE the rename serves the old name
    assert(spark.sql("SELECT sum(s.a) AS t FROM ne_t3 VERSION AS OF 0")
      .collect().head.getLong(0) == (0 until 40).sum.toLong)
  }

  test("DROP then re-ADD a nested name: fresh id, NOTHING resurrects") {
    val root = mkTable("ne_t4")
    val idBefore = idOf(FileManifest.schemaAt(spark, root).get, "s", "a").get
    spark.sql("ALTER TABLE ne_t4 DROP COLUMN s.a")
    assert(!FileManifest.schemaAt(spark, root).get("s").dataType
      .asInstanceOf[StructType].fieldNames.contains("a"))
    spark.sql("ALTER TABLE ne_t4 ADD COLUMN s.a INT")
    val idAfter = idOf(FileManifest.schemaAt(spark, root).get, "s", "a").get
    assert(idAfter != idBefore, "re-add must mint a FRESH id")
    // the old files physically carry `a` bytes — they must NOT surface
    assert(spark.sql("SELECT count(*) AS n FROM ne_t4 WHERE s.a IS NOT NULL")
      .collect().head.getLong(0) == 0L,
      "re-added nested field resurrected pre-drop bytes")
    assert(spark.sql("SELECT count(*) AS n FROM ne_t4").collect()
      .head.getLong(0) == 40L)
  }

  test("DML crossing a nested evolution re-stamps nested ids") {
    val root = mkTable("ne_t5")
    spark.sql("ALTER TABLE ne_t5 RENAME COLUMN s.a TO alpha")
    // CoW UPDATE rewrites files; the rewritten files must carry the
    // nested ids so the id-matched read keeps resolving them
    spark.sql("UPDATE ne_t5 SET v = v + 1000 WHERE k < 5")
    assert(spark.sql("SELECT sum(s.alpha) AS t FROM ne_t5")
      .collect().head.getLong(0) == (0 until 40).sum.toLong,
      "values lost through the DML rewrite")
    // and a SECOND rename after the rewrite still resolves everything
    spark.sql("ALTER TABLE ne_t5 RENAME COLUMN s.alpha TO a2")
    assert(spark.sql("SELECT sum(s.a2) AS t FROM ne_t5")
      .collect().head.getLong(0) == (0 until 40).sum.toLong)
    spark.sql("OPTIMIZE ne_t5 TARGET 1000 ROWS")
    assert(spark.sql("SELECT sum(s.a2) AS t FROM ne_t5")
      .collect().head.getLong(0) == (0 until 40).sum.toLong)
  }

  test("refusals: array paths, last subfield, unknown segments") {
    mkTable("ne_t6")
    val e1 = intercept[Exception] {
      spark.sql("ALTER TABLE ne_t6 ADD COLUMN s.a.z INT") }
    assert(e1.getMessage.contains("not a struct"), e1.getMessage)
    spark.sql("ALTER TABLE ne_t6 DROP COLUMN s.a")
    val e2 = intercept[Exception] {
      spark.sql("ALTER TABLE ne_t6 DROP COLUMN s.b") }
    assert(e2.getMessage.contains("no fields"), e2.getMessage)
    val e3 = intercept[Exception] {
      spark.sql("ALTER TABLE ne_t6 ADD COLUMN nope.x INT") }
    assert(e3.getMessage.contains("no field `nope`"), e3.getMessage)
    val e4 = intercept[Exception] {
      spark.sql("ALTER TABLE ne_t6 RENAME COLUMN s.b TO b") }
    assert(e4.getMessage.contains("already"), e4.getMessage)
  }
}
