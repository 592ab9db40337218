package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import scala.jdk.CollectionConverters._

/** Iceberg-style manifest pruning, from first principles.
  *
  * A table format's manifest is a tiny side table: one row per data
  * file carrying that file's per-column min/max. When a query filters
  * on a clustered column, the planner consults the manifest FIRST and
  * hands the scan only the files whose [min, max] intersects the
  * predicate — the other files are never opened. At 100 TB that is the
  * difference between "scan 25,000 files" and "scan the 60 whose range
  * can match": pruning cost is O(files) driver-side metadata work,
  * independent of data volume.
  *
  * This module builds the manifest the way Iceberg/Delta effectively
  * do — from parquet FOOTER statistics, a metadata-only read (no data
  * pages are touched; cost per file is one footer fetch, and on a real
  * deployment the write path would emit these rows directly so even
  * the footer pass disappears).
  *
  * Pruning is necessary-but-not-sufficient, so [[readPruned]] re-applies
  * the predicate on the surviving files; correctness never depends on
  * the manifest being tight, only completeness does.
  */
object FileManifest {

  /** Per-file stats for one long-valued column (covers int/bigint/
    * timestamp-micros physical types — the usual clustering keys). */
  final case class FileStats(path: String, rows: Long, min: Long, max: Long)

  /** Write `df` clustered by `sortCol`: range-repartitioned so files
    * cover disjoint key ranges (tight, non-overlapping min/max = the
    * layout that makes manifests effective), sorted within files so
    * row-group stats nest the same way. */
  def writeLayout(df: DataFrame, path: String, sortCol: String,
      numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode(SaveMode.Overwrite).parquet(path)

  /** Build the manifest by reading ONLY parquet footers. Runs on the
    * driver: one row per file is exactly the cardinality a manifest is
    * supposed to have (a 100 TB table at 1 GB/file is 10^5 rows — a
    * side table, not a dataset). */
  def buildManifest(spark: SparkSession, dir: String,
      column: String): Seq[FileStats] =
    buildManifests(spark, dir, Seq(column))(column)

  /** Manifests for several columns in ONE footer pass per file (a 2-D
    * box read needs two manifests; re-reading footers per dimension
    * would double the metadata latency for nothing). */
  def buildManifests(spark: SparkSession, dir: String,
      columns: Seq[String]): Map[String, Seq[FileStats]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = FileSystem.get(new java.net.URI(dir), conf)
    val files = fs.listStatus(new Path(dir)).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath)
    val perFile = files.map(p => footerStats(conf, p, columns))
    columns.map(c => c -> perFile.map(_(c)).sortBy(_.path)).toMap
  }

  private def footerStats(conf: Configuration, file: Path,
      columns: Seq[String]): Map[String, FileStats] = {
    val reader = ParquetFileReader.open(HadoopInputFile.fromPath(file, conf))
    try {
      val blocks = reader.getFooter.getBlocks.asScala
      var rows = 0L
      val mn = scala.collection.mutable.Map(
        columns.map(_ -> Long.MaxValue): _*)
      val mx = scala.collection.mutable.Map(
        columns.map(_ -> Long.MinValue): _*)
      val found = scala.collection.mutable.Set.empty[String]
      blocks.foreach { b =>
        rows += b.getRowCount
        b.getColumns.asScala.foreach { c =>
          val name = c.getPath.toDotString
          if (mn.contains(name)) {
            val st = c.getStatistics
            require(st != null && st.hasNonNullValue,
              s"no footer stats for $name in $file")
            found += name
            (st.genericGetMin, st.genericGetMax) match {
              case (lo: java.lang.Long, hi: java.lang.Long) =>
                mn(name) = math.min(mn(name), lo)
                mx(name) = math.max(mx(name), hi)
              case (lo: java.lang.Integer, hi: java.lang.Integer) =>
                mn(name) = math.min(mn(name), lo.longValue)
                mx(name) = math.max(mx(name), hi.longValue)
              case other => sys.error(
                s"unsupported stats type for $name: ${other.getClass}")
            }
          }
        }
      }
      // a missing column would leave the (MaxValue, MinValue) sentinels,
      // which prune() would treat as "can never match" — silent data
      // loss; fail loudly instead
      columns.foreach { c =>
        require(found(c) || rows == 0, s"column $c absent from $file")
      }
      columns.map(c =>
        c -> FileStats(file.toString, rows, mn(c), mx(c))).toMap
    } finally reader.close()
  }

  /** Files whose [min, max] intersects [lo, hi] — the survivors the
    * scan is allowed to open. */
  def prune(manifest: Seq[FileStats], lo: Long, hi: Long): Seq[FileStats] =
    manifest.filter(f => f.max >= lo && f.min <= hi)

  /** Incremental maintenance — the operations a live table needs so the
    * manifest NEVER requires a full rebuild: `append` stats just the
    * newly written files (an ingest batch touches O(new files) footers,
    * not O(table)), `expire` drops deleted/compacted-away entries. Both
    * keep the manifest sorted by path so appends are order-independent. */
  def append(manifest: Seq[FileStats], spark: SparkSession,
      newFiles: Seq[String], column: String): Seq[FileStats] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val known = manifest.map(_.path).toSet
    val fresh = newFiles.filterNot(known)
      .map(p => footerStats(conf, new Path(p), Seq(column))(column))
    (manifest ++ fresh).sortBy(_.path)
  }

  def expire(manifest: Seq[FileStats], removed: Seq[String]): Seq[FileStats] = {
    val gone = removed.toSet
    manifest.filterNot(f => gone(f.path))
  }

  /** Manifest-pruned ranged read: open only surviving files, then
    * re-apply the exact predicate (pruning is file-granular; the
    * residual filter still pushes down to the row-group/page level
    * inside the survivors via normal parquet filter pushdown). */
  def readPruned(spark: SparkSession, manifest: Seq[FileStats],
      column: String, lo: Long, hi: Long): DataFrame = {
    require(manifest.nonEmpty, "empty manifest")
    val survivors = prune(manifest, lo, hi).map(_.path)
    // every file pruned away is a legitimately-EMPTY result, not an
    // error (the full-scan mirror of the same predicate returns 0
    // rows); read one file for the schema and keep zero of its rows
    val src =
      if (survivors.nonEmpty) spark.read.parquet(survivors: _*)
      else spark.read.parquet(manifest.head.path).where(lit(false))
    src.filter(col(column) >= lo && col(column) <= hi)
  }

  /** Greedy key-order bin packing of manifest entries: consecutive
    * runs of files whose rows sum to at most `targetRows` (a too-big
    * single file keeps its own bin). Packing adjacent-by-key files
    * preserves the clustered layout, so the compacted table prunes as
    * well as the original — just with far fewer files. */
  def planCompaction(manifest: Seq[FileStats],
      targetRows: Long): Seq[Seq[FileStats]] = {
    val byKey = manifest.sortBy(f => (f.min, f.path))
    val bins = scala.collection.mutable.ArrayBuffer.empty[Seq[FileStats]]
    var cur = scala.collection.mutable.ArrayBuffer.empty[FileStats]
    var curRows = 0L
    byKey.foreach { f =>
      if (cur.nonEmpty && curRows + f.rows > targetRows) {
        bins += cur.toSeq; cur = scala.collection.mutable.ArrayBuffer.empty
        curRows = 0L
      }
      cur += f; curRows += f.rows
    }
    if (cur.nonEmpty) bins += cur.toSeq
    bins.toSeq
  }

  /** Small-file compaction: rewrite each planned bin as ONE file,
    * re-sorted on the cluster column. The driver work is O(files) over
    * the manifest; each bin is an independent shuffle-free single-task
    * rewrite of just its own files (an orchestrator would submit the
    * bin jobs concurrently; sequential submission here keeps the demo
    * simple — the data path is identical). */
  def compact(spark: SparkSession, manifest: Seq[FileStats], outDir: String,
      sortCol: String, targetRows: Long): Unit = {
    // clear the destination first: per-bin overwrite would leave stale
    // bins behind whenever the new plan has fewer of them
    val out = new Path(outDir)
    val fs = out.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(out, true)
    planCompaction(manifest, targetRows).zipWithIndex.foreach {
      case (bin, i) =>
        spark.read.parquet(bin.map(_.path): _*)
          .coalesce(1)
          .sortWithinPartitions(sortCol)
          .write.mode(SaveMode.Overwrite)
          .parquet(f"$outDir/bin_$i%05d")
    }
  }

  /** Read a compacted table back (bins are subdirectories). */
  def readCompacted(spark: SparkSession, outDir: String): DataFrame =
    spark.read.option("recursiveFileLookup", "true").parquet(outDir)
}
