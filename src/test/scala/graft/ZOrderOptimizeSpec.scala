package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.FileManifest

/** SQL `OPTIMIZE t TARGET n ROWS ZORDER BY (x, y)` (f39) — the layout
  * claim itself: after z-ordering, file-level [min, max] ranges on the
  * SECOND dimension must prune files the 1-D pre-zorder layout cannot,
  * while every value, version, and time-travel read is unchanged. */
class ZOrderOptimizeSpec extends AnyFunSuite {
  private lazy val spark = GraftSession.local(4)

  private val N = 4096

  /** (k, e, p): k clustered 1-D at create; e decorrelated from k via a
    * prime multiplier mod N, so a k-clustered file spans nearly the
    * whole e range — the worst case z-order exists to fix. */
  private def mkTable(name: String): String = {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("zo").toString + "/cat"
    val df = (0 until N).map { i =>
      (i.toLong, ((i * 7919) % N).toLong, if (i % 2 == 0) "a" else "b")
    }.toDF("k", "e", "p")
    df.write.format("graft")
      .option("path", root).option("partitionBy", "p")
      .option("clusterBy", "k").option("files", "8")
      .mode("overwrite").save()
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.sql(s"CREATE TABLE $name USING graft OPTIONS (path '$root')")
    root
  }

  /** Per partition-directory manifests on `e` for the given snapshot's
    * files (footer-stat read, the same pass the catalog builder uses). */
  private def eManifests(root: String,
      version: Long): Seq[Seq[FileManifest.FileStats]] = {
    val pm = FileManifest.loadVersion(spark, root, version)
    pm.partitions.valuesIterator.flatten.map(_.path).toSeq
      .groupBy(p => new org.apache.hadoop.fs.Path(p).getParent.toString)
      .toSeq.sortBy(_._1)
      .map { case (dir, _) =>
        FileManifest.buildManifests(spark, dir, Seq("e"))("e")
      }
  }

  test("ZORDER prunes on the second dimension where the 1-D layout cannot") {
    val root = mkTable("zo_t1")
    val before = spark.sql("SELECT k, e FROM zo_t1 ORDER BY k").collect()
    spark.sql(s"OPTIMIZE zo_t1 TARGET ${N / 8} ROWS ZORDER BY (k, e)")
    // values are invariant (pure layout) and both versions readable
    val after = spark.sql("SELECT k, e FROM zo_t1 ORDER BY k").collect()
    assert(before.toSeq == after.toSeq, "ZORDER must not change values")
    val v0 = spark.sql(
      "SELECT k, e FROM zo_t1 VERSION AS OF 0 ORDER BY k").collect()
    assert(v0.toSeq == before.toSeq, "v0 stays time-travelable")
    // pruning power on e: survivors of a narrow e-window
    val (lo, hi) = (0L, (N / 8).toLong - 1)
    def survivors(version: Long): (Int, Int) = {
      val ms = eManifests(root, version)
      (ms.map(m => FileManifest.prune(m, lo, hi).size).sum,
        ms.map(_.size).sum)
    }
    val (preKeep, preTotal) = survivors(0L)
    val (postKeep, postTotal) = survivors(1L)
    // 1-D on k leaves e unsorted: nearly every file's e-range spans
    // the window (decorrelated by construction; range-partitioner
    // SAMPLING makes boundaries nondeterministic, so allow one
    // lucky-narrow file rather than demanding exactly zero pruning)
    assert(preKeep >= preTotal - 1 && preTotal >= 4,
      s"test premise: pre-zorder (almost) nothing prunes " +
        s"($preKeep/$preTotal)")
    assert(postTotal > 1, s"need multiple post-zorder files, got $postTotal")
    assert(postKeep < postTotal,
      s"post-zorder the e-window must prune files ($postKeep/$postTotal)")
    assert(postKeep.toDouble / postTotal <= 0.75,
      s"expected a real pruning gain, got $postKeep/$postTotal")
  }

  test("ZORDER refuses non-integral, partition, and unknown columns") {
    mkTable("zo_t2")
    val e1 = intercept[Exception] {
      spark.sql("OPTIMIZE zo_t2 ZORDER BY (p, e)") }
    assert(e1.getMessage.contains("partition column"))
    val e2 = intercept[Exception] {
      spark.sql("OPTIMIZE zo_t2 ZORDER BY (k, nope)") }
    assert(e2.getMessage.contains("no such column"))
    val e3 = intercept[Exception] {
      spark.sql("OPTIMIZE zo_t2 ZORDER BY (k, k)") }
    assert(e3.getMessage.contains("DISTINCT"))
  }

  test("plain OPTIMIZE still routes the non-ZORDER shape") {
    val root = mkTable("zo_t3")
    spark.sql(s"OPTIMIZE zo_t3 TARGET $N ROWS")
    assert(FileManifest.latestVersion(spark, root).contains(1L))
    assert(spark.sql("SELECT count(*) AS n FROM zo_t3")
      .collect().head.getLong(0) == N.toLong)
  }
}
