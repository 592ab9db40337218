package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{SQLContext, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, DataSourceRegister, RelationProvider}
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL front door for [[FileManifest]] tables — `CREATE TABLE t USING
  * graft OPTIONS (path '<catalogRoot>')` gives plain `spark.sql`
  * users manifest-pruned reads without a line of Scala (the
  * Iceberg/Delta-shaped integration: the table format's value starts
  * when it is a TABLE, not a library call).
  *
  * Architecture: the scan itself stays Spark's native vectorized
  * parquet path (`FileSourceScanExec` — whole-stage codegen, pushed
  * filters, column pruning all intact); what the format contributes
  * is the FILE LISTING. [[ManifestFileIndex]] implements Spark's
  * `FileIndex` seam — exactly where Delta's TahoeFileIndex and
  * Iceberg's scan planning sit — and answers `listFiles` from the
  * PERSISTED catalog (the committed `v<N>` snapshot parquet of
  * [[FileManifest.commitVersion]]): partition filters drop whole
  * directory entries, range predicates on the clustering column drop
  * every file whose footer-stat [min, max] cannot match. At 100 TB
  * the scan's IO is decided here, before a single data file opens;
  * pruning is necessary-not-sufficient, and the surviving rows still
  * pass the full predicate inside the scan, so a loose manifest can
  * never widen a result.
  *
  * Options: `path` (the catalog root holding `commit-<N>` markers —
  * data file locations live IN the catalog), `version` (optional
  * time travel to a committed snapshot, the `loadVersion` surface).
  *
  * Reference context: the reference sample (StreamingJob.java:113-133)
  * sinks to raw files with no table metadata; this is the catalog
  * layer a production descendant of that pipeline grows first. */
final class GraftManifestSource extends RelationProvider
    with DataSourceRegister {
  override def shortName(): String = "graft"

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val catalogRoot = parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft datasource requires OPTIONS (path '<catalogRoot>')"))
    val pm = parameters.get("version") match {
      case Some(v) => FileManifest.loadVersion(spark, catalogRoot, v.toLong)
      case None => FileManifest.loadLatest(spark, catalogRoot)
    }
    val index = new ManifestFileIndex(spark, pm)
    val sample = pm.partitions.valuesIterator.flatten
      .nextOption().getOrElse(throw new IllegalArgumentException(
        s"empty catalog under $catalogRoot")).path
    // partition values are directory-encoded, so data files do not
    // carry the partition column — the index's schema supplies it
    val dataSchema = spark.read.parquet(sample).schema
    HadoopFsRelation(index, index.partitionSchema, dataSchema,
      None, new ParquetFileFormat, parameters)(spark)
  }
}

/** The catalog-backed `FileIndex`: one entry per (partition, file)
  * from the committed manifest snapshot, pruned at list time.
  * Driver-side state is the manifest itself — one row per FILE, the
  * cardinality a catalog is supposed to have (§[[FileManifest
  * .buildManifest]]), stat'ed once per directory at construction. */
final class ManifestFileIndex(spark: SparkSession,
    pm: FileManifest.PartitionedManifest) extends FileIndex {
  require(pm.partitions.nonEmpty, "empty catalog")

  // "<col>=<value>" — the dynamic-partition directory encoding the
  // layout writer produced and the catalog recorded verbatim
  private val partColName =
    pm.partitions.keysIterator.next().split("=", 2)(0)
  private def partValue(dirName: String): String =
    dirName.split("=", 2)(1)

  // one listStatus per partition directory (bounded: |partitions|
  // driver calls over a side table, not a per-file RPC storm)
  private val statusByPath: Map[String, FileStatus] = {
    val conf = spark.sparkContext.hadoopConfiguration
    pm.partitions.valuesIterator.flatten.map(_.path).toSeq
      .groupBy(p => new Path(p).getParent)
      .flatMap { case (dir, wanted) =>
        val fs = dir.getFileSystem(conf)
        val listed = fs.listStatus(dir)
          .map(st => st.getPath.toString -> st).toMap
        wanted.map(p => p -> listed.getOrElse(p,
          throw new IllegalStateException(
            s"catalog references missing file $p")))
      }
  }

  override val rootPaths: Seq[Path] =
    Seq(new Path(pm.partitions.valuesIterator.flatten.next().path)
      .getParent.getParent)

  override val partitionSchema: StructType =
    StructType(Seq(StructField(partColName, StringType, nullable = true)))

  /** Clamp [lo, hi] bounds on the clustering column from the pushed
    * data filters. Extraction is best-effort BY DESIGN: anything not
    * recognized leaves the bounds open, and the scan re-applies every
    * predicate on the rows — pruning can only ever narrow IO. */
  private def boundsOf(dataFilters: Seq[Expression]): (Long, Long) = {
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def asLong(v: Any): Option[Long] = v match {
      case i: Int => Some(i.toLong)
      case l: Long => Some(l)
      case s: Short => Some(s.toLong)
      case b: Byte => Some(b.toLong)
      case _ => None
    }
    def isCol(e: Expression): Boolean = e match {
      case a: AttributeReference => a.name == pm.column
      case _ => false
    }
    dataFilters.foreach {
      case GreaterThan(a, Literal(v, _)) if isCol(a) =>
        asLong(v).foreach(x => lo = math.max(lo, x + 1))
      case GreaterThanOrEqual(a, Literal(v, _)) if isCol(a) =>
        asLong(v).foreach(x => lo = math.max(lo, x))
      case LessThan(a, Literal(v, _)) if isCol(a) =>
        asLong(v).foreach(x => hi = math.min(hi, x - 1))
      case LessThanOrEqual(a, Literal(v, _)) if isCol(a) =>
        asLong(v).foreach(x => hi = math.min(hi, x))
      case EqualTo(a, Literal(v, _)) if isCol(a) =>
        asLong(v).foreach { x =>
          lo = math.max(lo, x); hi = math.min(hi, x) }
      case EqualTo(Literal(v, _), a) if isCol(a) =>
        asLong(v).foreach { x =>
          lo = math.max(lo, x); hi = math.min(hi, x) }
      case GreaterThan(Literal(v, _), a) if isCol(a) => // v > col
        asLong(v).foreach(x => hi = math.min(hi, x - 1))
      case GreaterThanOrEqual(Literal(v, _), a) if isCol(a) =>
        asLong(v).foreach(x => hi = math.min(hi, x))
      case LessThan(Literal(v, _), a) if isCol(a) => // v < col
        asLong(v).foreach(x => lo = math.max(lo, x + 1))
      case LessThanOrEqual(Literal(v, _), a) if isCol(a) =>
        asLong(v).foreach(x => lo = math.max(lo, x))
      case In(a, vs) if isCol(a) && vs.forall(_.isInstanceOf[Literal]) =>
        val xs = vs.collect { case Literal(v, _) => asLong(v) }.flatten
        if (xs.nonEmpty && xs.length == vs.length) {
          lo = math.max(lo, xs.min); hi = math.min(hi, xs.max)
        }
      case _ => ()
    }
    (lo, hi)
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    // bind the partition predicate against this index's one-column
    // partition row (the PartitioningAwareFileIndex discipline)
    val keep: InternalRow => Boolean =
      if (partitionFilters.isEmpty) _ => true
      else {
        val bound = Predicate.createInterpreted(
          partitionFilters.reduce(org.apache.spark.sql.catalyst
            .expressions.And).transform {
            case a: AttributeReference if a.name == partColName =>
              BoundReference(0, StringType, nullable = true)
          })
        bound.eval(_)
      }
    val (lo, hi) = boundsOf(dataFilters)
    pm.partitions.toSeq.sortBy(_._1).flatMap { case (dirName, files) =>
      val row = InternalRow(UTF8String.fromString(partValue(dirName)))
      if (!keep(row)) None
      else {
        val survivors = FileManifest.prune(files, lo, hi)
        if (survivors.isEmpty) None
        else Some(PartitionDirectory(row,
          survivors.map(f => statusByPath(f.path)).toArray))
      }
    }
  }

  override def inputFiles: Array[String] = statusByPath.keys.toArray.sorted

  override def refresh(): Unit = ()

  override def sizeInBytes: Long = statusByPath.values.map(_.getLen).sum
}
