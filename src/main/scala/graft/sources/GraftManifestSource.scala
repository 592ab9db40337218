package graft.sources

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.{DataFrame, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, BoundReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, Predicate}
import org.apache.spark.sql.execution.datasources.{FileIndex, HadoopFsRelation, PartitionDirectory}
import org.apache.spark.sql.execution.datasources.parquet.ParquetFileFormat
import org.apache.spark.sql.sources.{BaseRelation, CreatableRelationProvider, DataSourceRegister, RelationProvider}
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
  * Read options: `path` (the catalog root holding `commit-<N>`
  * markers — data file locations live IN the catalog), `version`
  * (time travel to a committed snapshot, the `loadVersion` surface)
  * or `timestampAsOf` (epoch millis — the `loadAsOf` surface).
  *
  * WRITE path — `df.write.format("graft")` and CTAS: every save
  * clusters the batch (`writePartitionedLayout` — dynamic-partition
  * dirs on `partitionBy`, range-clustered on `clusterBy` so footer
  * stats stay tight), footer-stats ONLY the new files, and commits
  * the next catalog version atomically; `overwrite` commits a
  * version referencing only the new files (old versions stay
  * readable — logical replacement, time travel intact), `append`
  * merges the new files into the latest snapshot's entries.
  *
  * `INSERT INTO` (r10) routes through the SAME atomic catalog-commit
  * path: the index's `rootPaths` points at a per-table STAGING
  * directory under the catalog root, so Spark's generic file insert
  * (InsertIntoHadoopFsRelationCommand) writes its files there — never
  * into the data tree — and the `fileIndex.refresh()` call the
  * command makes after a successful write adopts the staged files by
  * move into a fresh immutable batch directory, footer-stats them,
  * and commits the next catalog version atomically
  * ([[ManifestFileIndex.refresh]]). A crash before the commit leaves
  * only staged files the next insert's refresh adopts; rows are
  * never visible until their version's one-marker commit.
  * `INSERT OVERWRITE` is still REFUSED loudly — its pre-delete wipes
  * only the staging directory (taking the append sentinel with it,
  * which is how refresh DETECTS it); silently treating it as append
  * would be wrong, and physically overwriting would break the
  * versions time travel still reads. Time-traveled tables
  * (`version`/`timestampAsOf`) refuse every insert.
  *
  * Reference context: the reference sample (StreamingJob.java:113-133)
  * sinks to raw files with no table metadata; this is the catalog
  * layer a production descendant of that pipeline grows first. */
final class GraftManifestSource extends RelationProvider
    with CreatableRelationProvider
    with org.apache.spark.sql.sources.StreamSourceProvider
    with org.apache.spark.sql.sources.StreamSinkProvider
    with DataSourceRegister {
  override def shortName(): String = "graft"

  private def rootOf(parameters: Map[String, String]): String =
    parameters.getOrElse("path",
      throw new IllegalArgumentException(
        "graft datasource requires OPTIONS (path '<catalogRoot>')"))

  override def createRelation(sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val spark = sqlContext.sparkSession
    val catalogRoot = rootOf(parameters)
    val travel = parameters.get("version").orElse(
      parameters.get("timestampasof")).orElse(
      parameters.get("timestampAsOf"))
    val pinnedV: Option[Long] =
      (parameters.get("version"), parameters.get("timestampasof")
          .orElse(parameters.get("timestampAsOf"))) match {
        case (Some(v), _) => Some(v.toLong)
        case (None, Some(ts)) =>
          // the version loadAsOf resolves — needed to pick the schema
          // EPOCH the pinned snapshot belongs to
          FileManifest.versionHistory(spark, catalogRoot)
            .filter(_._2 <= ts.toLong).map(_._1).maxOption
        case _ => None
      }
    val pm = (parameters.get("version"), parameters.get("timestampasof")
        .orElse(parameters.get("timestampAsOf"))) match {
      case (Some(v), _) => FileManifest.loadVersion(spark, catalogRoot, v.toLong)
      case (None, Some(ts)) => FileManifest.loadAsOf(spark, catalogRoot, ts.toLong)
      case _ => FileManifest.loadLatest(spark, catalogRoot)
    }
    val index = new ManifestFileIndex(spark, pm,
      catalogRoot = Some(catalogRoot), timeTraveled = travel.nonEmpty)
    val sample = pm.partitions.valuesIterator.flatten
      .nextOption().getOrElse(throw new IllegalArgumentException(
        s"empty catalog under $catalogRoot")).path
    // partition values are directory-encoded, so data files do not
    // carry the partition column — the index's schema supplies it.
    // The catalog-tracked schema (ALTER TABLE ADD COLUMN) wins over
    // the sampled file schema: files older than an evolution lack the
    // added columns and the parquet reader null-fills them
    val dataSchema = FileManifest.schemaAt(spark, catalogRoot, pinnedV)
      .getOrElse(spark.read.parquet(sample).schema)
    // field-id matching for THIS relation's scans: the options map
    // lands in the scan's hadoopConf (newHadoopConfWithOptions), so
    // files are matched by the schema's committed field ids — a
    // renamed column's old files resolve by id, and a re-added name's
    // fresh id can never match pre-drop bytes. Inert on pre-field-id
    // catalogs (id matching engages only for fields that carry ids).
    // The map must be PLAIN: `parameters` is a CaseInsensitiveMap
    // whose iteration lowercases keys, and hadoop Configuration keys
    // are case-sensitive — a lowercased flag never matches.
    val scanParams = Map(parameters.toSeq: _*) +
      ("spark.sql.parquet.fieldId.read.enabled" -> "true")
    HadoopFsRelation(index, index.partitionSchema, dataSchema,
      None, new GraftParquetFileFormat, scanParams)(spark)
  }

  override def createRelation(sqlContext: SQLContext, mode: SaveMode,
      parameters: Map[String, String], data: DataFrame): BaseRelation = {
    val spark = sqlContext.sparkSession
    val root = rootOf(parameters)
    // partitionBy accepts a comma-separated list — multi-column
    // (date, region)-shaped Hive-nested layouts are first-class
    val partCols = parameters.getOrElse("partitionby",
      parameters.getOrElse("partitionBy", throw new IllegalArgumentException(
        "graft write requires OPTIONS (partitionBy '<col>[,<col2>…]')")))
      .split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    require(partCols.nonEmpty && partCols.distinct.size == partCols.size,
      s"graft write: bad partitionBy list $partCols")
    val clusterCol = parameters.getOrElse("clusterby",
      parameters.getOrElse("clusterBy", throw new IllegalArgumentException(
        "graft write requires OPTIONS (clusterBy '<column>')")))
    require(!partCols.contains(clusterCol),
      s"clusterBy '$clusterCol' cannot also be a partition column")
    val numFiles = parameters.getOrElse("files", "16").toInt
    val existing = FileManifest.latestVersion(spark, root)
    (mode, existing) match {
      case (SaveMode.ErrorIfExists, Some(v)) =>
        throw new IllegalStateException(
          s"graft table at $root already exists (version $v)")
      case (SaveMode.Ignore, Some(_)) => ()
      case _ =>
        // each batch lands in its own immutable directory (uniquely
        // suffixed past v0 — two writers deriving the same number must
        // never share a dir whose Overwrite would wipe the other's
        // files) — versions never share mutable state, so time travel
        // and orphan GC keep working across overwrites
        val next = existing.map(_ + 1).getOrElse(0L)
        val dataDir =
          if (existing.isEmpty) s"$root/data/b0"
          else s"$root/data/b$next-" +
            java.util.UUID.randomUUID.toString.take(8)
        val op = (mode, existing) match {
          case (SaveMode.Append, Some(_)) => "append"
          case (_, Some(_)) => "overwrite"
          case _ => "create"
        }
        // FIELD IDS: create/overwrite mint a fresh id-mapped data
        // schema (above the catalog's high-water mark — ids are never
        // reused); append re-stamps the COMMITTED schema's ids so the
        // new files match the table's identity map. The data schema
        // excludes the directory-encoded partition column.
        val dataFields = org.apache.spark.sql.types.StructType(
          data.schema.fields.filterNot(f => partCols.contains(f.name)))
        val idSchema: Option[StructType] = op match {
          case "append" => FileManifest.schemaAt(spark, root)
          case _ =>
            val startAt =
              if (existing.isEmpty) 1L
              else FileManifest.maxFieldIdAt(spark, root) + 1L
            Some(FileManifest.assignFieldIds(dataFields, startAt))
        }
        idSchema.filter(s => op == "append").foreach { s =>
          require(dataFields.fieldNames.sorted.sameElements(
            s.fieldNames.sorted),
            s"graft append schema ${dataFields.fieldNames.mkString(",")} " +
              s"!= table schema ${s.fieldNames.mkString(",")}")
        }
        val stamped = idSchema.fold(data)(
          FileManifest.stampFieldIds(data, _))
        FileManifest.writePartitionedLayout(stamped, dataDir, partCols,
          clusterCol, numFiles)
        // WRITE-TIME CONSTRAINTS: the landed batch (invisible until
        // the commit below) must satisfy every declared CHECK; a
        // violating append/overwrite refuses atomically, the batch
        // dir swept (create commits v0 — nothing declared yet)
        if (existing.isDefined)
          FileManifest.enforceConstraints(spark, root,
            spark.read.parquet(dataDir), s"$op batch",
            cleanup = () => {
              val dfs = new Path(dataDir).getFileSystem(
                spark.sparkContext.hadoopConfiguration)
              dfs.delete(new Path(dataDir), true); ()
            })
        // footer-stat ONLY the new files (batch-sized metadata work)
        val fresh = FileManifest.buildPartitioned(spark, dataDir, clusterCol)
        val schemaMeta: Map[String, String] = op match {
          case "append" => Map.empty // inherited forward by commitVersion
          case _ => idSchema.map(s => Map("schema" -> s.json,
            "maxFieldId" -> FileManifest.schemaMaxFieldId(s).toString))
            .getOrElse(Map.empty)
        }
        if (op == "append") {
          // append-append commutes: optimistic retry re-folds the new
          // files onto whatever head won the race (the conditional
          // commit prevents basing the manifest on a stale head)
          var attempt = 0
          var done = false
          while (!done) {
            attempt += 1
            val cur = FileManifest.loadLatest(spark, root)
            require(cur.column == clusterCol,
              s"append clusterBy '$clusterCol' != table's '${cur.column}'")
            val pm = cur.copy(
              partitions = fresh.partitions.foldLeft(cur.partitions) {
                case (acc, (part, files)) =>
                  acc.updated(part, acc.getOrElse(part, Nil) ++ files)
              })
            val expect = FileManifest.latestVersion(spark, root).get + 1
            try {
              FileManifest.commitVersion(spark, pm, root,
                meta = Map("operation" -> op), expected = Some(expect))
              done = true
            } catch {
              case e: FileManifest.CommitConflictException =>
                if (attempt >= 8) throw e
            }
          }
        } else
          // create / overwrite: only the new files — logical
          // replacement carries nothing, so no retry content to re-fold
          FileManifest.commitVersion(spark, fresh, root,
            meta = Map("operation" -> op) ++ schemaMeta)
    }
    createRelation(sqlContext, parameters)
  }

  // ---- streaming READ: the committed version chain as a Source ----

  private def boolOpt(parameters: Map[String, String],
      names: String*): Boolean =
    names.flatMap(parameters.get).headOption.exists(_.toBoolean)

  override def sourceSchema(sqlContext: SQLContext,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): (String, StructType) = {
    val base = GraftStreamSource.schemaOf(
      sqlContext.sparkSession, rootOf(parameters))
    val changeFeed = boolOpt(parameters, "changefeed", "changeFeed",
      "readchangefeed", "readChangeFeed")
    val wantVersion = changeFeed ||
      boolOpt(parameters, "withversioncolumn", "withVersionColumn")
    var s = base
    if (wantVersion) s = s.add(StructField("_graft_version",
      org.apache.spark.sql.types.LongType, nullable = false))
    if (changeFeed) s = s.add(StructField("_change_type",
      StringType, nullable = false))
    (shortName(), s)
  }

  override def createSource(sqlContext: SQLContext, metadataPath: String,
      schema: Option[StructType], providerName: String,
      parameters: Map[String, String]): org.apache.spark.sql.execution
      .streaming.Source = {
    val changeFeed = boolOpt(parameters, "changefeed", "changeFeed",
      "readchangefeed", "readChangeFeed")
    new GraftStreamSource(sqlContext.sparkSession, rootOf(parameters),
      parameters.get("startingversion")
        .orElse(parameters.get("startingVersion")).map(_.toLong)
        .getOrElse(0L),
      maxVersionsPerBatch = parameters.get("maxversionsperbatch")
        .orElse(parameters.get("maxVersionsPerBatch")).map(_.toLong),
      withVersionColumn = changeFeed ||
        boolOpt(parameters, "withversioncolumn", "withVersionColumn"),
      changeFeed = changeFeed)
  }

  // ---- streaming WRITE: micro-batches as committed versions ----

  override def createSink(sqlContext: SQLContext,
      parameters: Map[String, String], partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode)
      : org.apache.spark.sql.execution.streaming.Sink = {
    require(outputMode == org.apache.spark.sql.streaming.OutputMode.Append(),
      s"graft streaming sink supports Append output only, got $outputMode " +
        "— update/complete would have to rewrite history the version " +
        "chain exists to preserve (aggregate maintenance is c8/c13's job)")
    val partCols: Seq[String] =
      if (partitionColumns.nonEmpty) partitionColumns
      else parameters.getOrElse("partitionby",
        parameters.getOrElse("partitionBy",
          throw new IllegalArgumentException(
            "graft streaming sink requires OPTIONS (partitionBy " +
              "'<col>[,<col2>…]') or .partitionBy(...)")))
        .split(',').toSeq.map(_.trim).filter(_.nonEmpty)
    require(partCols.nonEmpty, "graft streaming sink: empty partitionBy")
    val clusterCol = parameters.getOrElse("clusterby",
      parameters.getOrElse("clusterBy", throw new IllegalArgumentException(
        "graft streaming sink requires OPTIONS (clusterBy '<column>')")))
    new GraftStreamSink(sqlContext.sparkSession, rootOf(parameters),
      partCols, clusterCol,
      parameters.getOrElse("files", "16").toInt)
  }
}

/** `spark.readStream.format("graft")` — the INCREMENTAL read side of
  * the table format (Delta's streaming-source role): offsets are the
  * catalog's committed VERSION numbers, and each micro-batch is
  * exactly the files ADDED by the versions in its (start, end] range,
  * read through the catalog with the partition column restored from
  * the directory encoding — O(increment) IO per batch however large
  * the table has grown, which is the whole point at 100 TB (tailing a
  * table must not re-list, let alone re-read, the table).
  *
  * Exactly-once composes with the c9 sink discipline for free: the
  * version chain is immutable and the offset IS the version, so a
  * restarted query re-reads precisely the committed versions its
  * checkpoint says it owes, bit-for-bit.
  *
  * Semantics guard: the source REFUSES a version that removed or
  * replaced files (overwrite, compaction, CoW delete) — silently
  * re-emitting rewritten rows or skipping removals would corrupt
  * every downstream aggregate (Delta's readChangeFeed-less default
  * makes the same refusal). Appends are the streaming contract;
  * `startingVersion` picks where the tail begins (default 0 = the
  * table's full history, the bootstrap-then-follow pattern).
  *
  * CHANGE-FEED mode (`changeFeed 'true'`, r11 — the Delta CDF shape):
  * instead of refusing rewrite versions, every version emits rows
  * tagged (`_graft_version`, `_change_type` I/D). An append-only
  * version keeps the fast path — its added files ARE the I rows,
  * zero diff work; a version that rewrote files (CoW UPDATE/DELETE,
  * logical overwrite) emits the snapshotDiff (f9) of exactly the
  * churned files: I = added∖removed rows, D = removed∖added rows, so
  * rows an update carried verbatim cancel and only true changes flow.
  * The diff is a pure multiset function of two immutable file sets,
  * so a replayed batch is row-for-row identical (exactly-once under
  * checkpoint recovery, same as the append path). IO per batch is
  * O(churned files of the increment), never the table.
  */
final class GraftStreamSource(spark: SparkSession, root: String,
    startingVersion: Long,
    maxVersionsPerBatch: Option[Long] = None,
    withVersionColumn: Boolean = false,
    changeFeed: Boolean = false)
    extends org.apache.spark.sql.execution.streaming.Source {
  import org.apache.spark.sql.execution.streaming.{Offset => V1Offset}
  import org.apache.spark.sql.execution.streaming.runtime.LongOffset
  require(maxVersionsPerBatch.forall(_ >= 1),
    s"maxVersionsPerBatch must be >= 1: $maxVersionsPerBatch")

  private val schema0 = {
    val base = GraftStreamSource.schemaOf(spark, root)
    var s =
      if (withVersionColumn || changeFeed)
        base.add(StructField("_graft_version",
          org.apache.spark.sql.types.LongType, nullable = false))
      else base
    if (changeFeed)
      s = s.add(StructField("_change_type", StringType, nullable = false))
    s
  }
  override def schema: StructType = schema0

  // rate limiting (maxVersionsPerBatch, the maxFilesPerTrigger role):
  // the source itself meters what it OFFERS — the v1 engine processes
  // (committed, getOffset] as one batch, so a bounded drain of a long
  // history needs the offer capped, not the read. getBatch raises the
  // floor on restart (the engine replays the checkpointed range
  // first), so recovery never re-meters what was already owed.
  private var lastOffered: Long = startingVersion - 1L

  override def getOffset: Option[V1Offset] =
    FileManifest.latestVersion(spark, root).flatMap { latest =>
      // a stream started AHEAD of the catalog (startingVersion not yet
      // committed) waits — offering anything below startingVersion
      // would make getBatch resolve versions that don't exist yet
      if (latest < startingVersion) None
      else {
        val capped = maxVersionsPerBatch
          .map(m => math.min(latest, lastOffered + m)).getOrElse(latest)
        lastOffered = math.max(capped, lastOffered)
        Some(LongOffset(lastOffered))
      }
    }

  private def versionOf(o: V1Offset): Long = o match {
    case LongOffset(v) => v
    case other => other.json.trim.toLong
  }

  private def filesOf(v: Long): Set[String] =
    FileManifest.loadVersion(spark, root, v)
      .partitions.valuesIterator.flatten.map(_.path).toSet

  override def getBatch(start: Option[V1Offset], end: V1Offset)
      : DataFrame = {
    val from = start.map(versionOf(_) + 1).getOrElse(startingVersion)
    val to = versionOf(end)
    lastOffered = math.max(lastOffered, to) // restart catch-up
    if (from > to) {
      // empty range (e.g. a legacy checkpoint offered startingVersion-1
      // before the catalog reached it): nothing owed, and crucially no
      // filesOf() touch on a version that may not exist
      val empty = spark.createDataFrame(
        java.util.Collections.emptyList[org.apache.spark.sql.Row](), schema0)
      return org.apache.spark.sql.graftshim.SparkShims
        .asStreamingDataFrame(empty)
    }
    val batch = GraftStreamSource.changesFrame(spark, root, from, to,
      schema0, withVersionColumn, changeFeed)
    org.apache.spark.sql.graftshim.SparkShims.asStreamingDataFrame(batch)
  }

  override def stop(): Unit = ()
  override def toString: String = s"GraftStreamSource[$root]"
}

object GraftStreamSource {
  /** The table (batch) root above a data file's partition directory
    * chain — every data file lives at
    * <root>/<col>=<val>[/<col2>=<val2>…]/<file>, so the root is
    * `levels + 1` parents up (levels = partition column count). */
  private[sources] def tableRootOf(file: String, levels: Int = 1): String =
    (0 until levels).foldLeft(new Path(file).getParent)(
      (p, _) => p.getParent).toString

  /** Declared stream schema: the data files' columns plus the
    * directory-encoded partition column, exactly as a batch read
    * with the same basePath resolves them. */
  private[sources] def schemaOf(spark: SparkSession,
      root: String): StructType = {
    val pm = FileManifest.loadLatest(spark, root)
    val levels = pm.partitions.keysIterator.next().split('/').length
    val sample = pm.partitions.valuesIterator.flatten
      .map(_.path).toSeq.sorted.headOption
      .getOrElse(throw new IllegalArgumentException(
        s"empty graft catalog under $root"))
    val sampled = spark.read
      .option("basePath", tableRootOf(sample, levels))
      .parquet(sample).schema
    // the catalog-tracked schema (ALTER TABLE ADD COLUMN) wins over a
    // sampled pre-evolution file; the directory-encoded partition
    // column still comes from the sample read
    FileManifest.schemaAt(spark, root) match {
      case Some(ds) => StructType(ds.fields ++
        sampled.fields.filterNot(f => ds.fieldNames.contains(f.name)))
      case None => sampled
    }
  }

  /** The shared version-walk core behind both the streaming source and
    * the batch [[tableChanges]] read: the committed version range
    * [from, to] as ONE DataFrame. Per version, an append keeps the
    * fast path (its added files ARE the rows — zero diff work); a
    * version that removed/replaced files either refuses (tail mode) or
    * emits the f9 snapshot diff of exactly the churned files
    * (change-feed mode). IO is O(files the range touched), never the
    * table. */
  private[sources] def changesFrame(spark: SparkSession, root: String,
      from: Long, to: Long, outSchema: StructType,
      withVersionColumn: Boolean, changeFeed: Boolean): DataFrame = {
    def filesOf(v: Long): Set[String] =
      FileManifest.loadVersion(spark, root, v)
        .partitions.valuesIterator.flatten.map(_.path).toSet
    val levels = FileManifest.loadVersion(spark, root, to)
      .partitions.keysIterator.next().split('/').length
    var prev: Set[String] =
      if (from == 0L) Set.empty else filesOf(from - 1)
    // (version, added files, removed files) per owed version; removals
    // refuse in tail mode and become D rows in change-feed mode
    val perVersion = Seq.newBuilder[(Long, Seq[String], Seq[String])]
    for (v <- from to to) {
      val cur = filesOf(v)
      val removed = prev -- cur
      if (removed.nonEmpty && !changeFeed)
        throw new IllegalStateException(
          s"graft stream at $root: version $v removed/replaced " +
            s"${removed.size} file(s) — the streaming source requires " +
            "an append-only version chain (overwrite/compaction/delete " +
            "history cannot be tailed; use changeFeed 'true' for the " +
            "row-level I/D feed, or start a fresh stream from a snapshot)")
      perVersion += ((v, (cur -- prev).toSeq.sorted, removed.toSeq.sorted))
      prev = cur
    }
    val groups = perVersion.result()
      .filter(g => g._2.nonEmpty || g._3.nonEmpty)
    val anyFile = prev.headOption.getOrElse(
      filesOf(to).headOption.getOrElse(throw new IllegalStateException(
        s"graft stream at $root: version $to has no files")))
    import org.apache.spark.sql.functions.{col => fcol, lit => flit}
    // every write batch owns an immutable data/b<N> directory, so the
    // partition dirs of different versions have different parents —
    // one basePath cannot span them; read per batch dir and union.
    // pin every read to the declared table schema: a change feed can
    // cross an ADD COLUMN evolution, where old files lack the added
    // columns (the reader null-fills them) — an unpinned read would
    // fail the union on the mixed layout
    val tableSchema = StructType(outSchema.fields.filterNot(f =>
      f.name == "_graft_version" || f.name == "_change_type"))
    def readRestored(fs: Seq[String]): DataFrame =
      fs.groupBy(tableRootOf(_, levels)).toSeq.sortBy(_._1)
        .map { case (base, group) =>
          // field-id matched (inert pre-ids): a change feed can cross
          // a RENAME, where old files carry the old physical name
          FileManifest.pinnedReader(spark, tableSchema)
            .option("basePath", base)
            .parquet(group.sorted: _*)
        }
        .reduce(_.unionByName(_))
    // The version tag (when asked for) is a per-group literal — the
    // CDC-feed shape downstream consumers key their own state on.
    def tag(df: DataFrame, v: Long, change: String): DataFrame = {
      val withV =
        if (withVersionColumn) df.withColumn("_graft_version", flit(v))
        else df
      if (changeFeed) withV.withColumn("_change_type", flit(change))
      else withV
    }
    def versionFrame(v: Long, added: Seq[String],
        removed: Seq[String]): DataFrame =
      if (removed.isEmpty) tag(readRestored(added), v, "I") // append fast path
      else {
        // churned version: the f9 snapshotDiff over exactly the
        // rewritten files — carried-verbatim rows cancel, only true
        // row changes surface as I (new image) / D (old image)
        lazy val emptySide = readRestored(Seq(anyFile)).where(flit(false))
        val a = if (added.isEmpty) emptySide else readRestored(added)
        val r = if (removed.isEmpty) emptySide else readRestored(removed)
        tag(a.exceptAll(r), v, "I").unionByName(tag(r.exceptAll(a), v, "D"))
      }
    val batch0 =
      if (groups.nonEmpty)
        groups.map { case (v, a, r) => versionFrame(v, a, r) }
          .reduce(_.unionByName(_))
      else tag(readRestored(Seq(anyFile)).where(flit(false)), to, "I")
    // pin every batch to the DECLARED schema: partition-column type
    // inference must not drift between batches
    batch0.select(outSchema.fields.toSeq.map(f =>
      fcol(f.name).cast(f.dataType)): _*)
  }

  /** BATCH CDC read — the Delta `table_changes(t, from, to)` shape:
    * the row-level change feed of the committed version range
    * [fromVersion, toVersion] as a plain DataFrame, every row tagged
    * (`_graft_version`, `_change_type` I/D). Same semantics as the
    * streaming change feed (c12) without the streaming machinery: an
    * append version's added files are its I rows verbatim; a CoW
    * rewrite version emits added∖removed as I and removed∖added as D,
    * so rows a rewrite carried bit-identical cancel and only true
    * changes surface. The chain is immutable, so the same range always
    * returns the same rows — an incremental batch consumer can
    * checkpoint nothing but the last version it folded. IO is
    * O(files churned by the range), never the table. */
  def tableChanges(spark: SparkSession, root: String, fromVersion: Long,
      toVersion: Option[Long] = None): DataFrame = {
    val latest = FileManifest.latestVersion(spark, root).getOrElse(
      throw new IllegalArgumentException(
        s"no committed graft catalog under $root"))
    val to = toVersion.getOrElse(latest)
    require(fromVersion >= 0 && fromVersion <= to,
      s"table_changes: need 0 <= from <= to, got [$fromVersion, $to]")
    require(to <= latest,
      s"table_changes: version $to not committed yet (latest: $latest)")
    val outSchema = schemaOf(spark, root)
      .add(StructField("_graft_version",
        org.apache.spark.sql.types.LongType, nullable = false))
      .add(StructField("_change_type", StringType, nullable = false))
    changesFrame(spark, root, fromVersion, to, outSchema,
      withVersionColumn = true, changeFeed = true)
  }
}

/** `spark.writeStream.format("graft")` — the native streaming SINK
  * (Delta's streaming-sink role), closing the loop the source opened:
  * each micro-batch lands as ONE committed catalog version, so a
  * graft table can sit at BOTH ends of a stream with no foreachBatch
  * glue (the WAP sink — GovernedIngest — remains the audited
  * alternative; this is the plain bronze-ingest path).
  *
  * EXACTLY-ONCE: the engine replays micro-batches after recovery, so
  * the sink must dedupe by batch id — SCOPED TO THE QUERY. Spark
  * batch ids are per-checkpoint, so a NEW streaming query writing to
  * an existing sink table (a reprocess/backfill, or two streams
  * fanning into one table) restarts at batch 0; deduping on the bare
  * id would silently skip every batch ≤ the prior query's max —
  * silent data loss. The dedupe key is therefore (queryId, batchId),
  * the Delta-sink discipline: the query id comes from the
  * `sql.streaming.queryId` local property the stream execution sets
  * on the batch thread, and both ride IN the version directory
  * (`_meta`, written before — and only visible with — the atomic
  * commit marker), so "was this batch committed?" has the same
  * linearization point as the commit itself: crash before the marker
  * = an orphan the next attempt overwrites (commitVersion's
  * crashed-attempt cleanup + the GC sweep); crash after = the replay
  * sees the id pair and skips. Batch ids are monotone per query, so
  * the sink tracks only the MAX committed id per query (one
  * O(versions) manifest scan per query id, cached after).
  *
  * The commit itself is CONDITIONAL on the version the merged
  * manifest was derived from (`expected`): a concurrent commit
  * landing between loadLatest and the marker would otherwise be
  * silently clobbered — its files absent from the sink's stale-based
  * manifest. The conflict throws, the batch fails, and the engine's
  * retry replays it against the fresh head.
  *
  * At 100 TB: per batch, IO is the batch's own rows (layout write +
  * footer stats) + one manifest save — never the table. */
final class GraftStreamSink(spark: SparkSession, root: String,
    partCols: Seq[String], clusterCol: String, numFiles: Int)
    extends org.apache.spark.sql.execution.streaming.Sink {

  private val BatchKey = "streamingBatchId"
  private val QueryKey = "streamingQueryId"

  /** Max batch id this QUERY has committed (−1 when none). Versions
    * written by builds that predate query scoping carry no query id;
    * they count only for the legacy no-id caller, so a fresh query's
    * batch 0 is never mistaken for a replay of an old query's. */
  private def scanMaxBatchId(queryId: Option[String]): Long =
    FileManifest.versionHistory(spark, root).map(_._1)
      .flatMap { v =>
        val meta = FileManifest.versionMeta(spark, root, v)
        if (meta.get(QueryKey) == queryId) meta.get(BatchKey) else None
      }
      .map(_.toLong).maxOption.getOrElse(-1L)

  private val maxCommitted =
    scala.collection.mutable.Map.empty[Option[String], Long]

  override def addBatch(batchId: Long, data: DataFrame): Unit =
    synchronized {
      val queryId = Option(spark.sparkContext
        .getLocalProperty(org.apache.spark.sql.execution.streaming
          .runtime.StreamExecution.QUERY_ID_KEY))
      if (queryId.isEmpty)
        logWarnOnce("graft sink: no sql.streaming.queryId on the batch " +
          "thread — exactly-once dedupe falls back to the bare batch id " +
          "(unsafe if a different query ever wrote this table)")
      val max = maxCommitted.getOrElseUpdate(queryId,
        scanMaxBatchId(queryId))
      if (batchId <= max) return // recovery replay: already in
      val df = org.apache.spark.sql.graftshim.SparkShims
        .asBatchDataFrame(data)
      if (df.isEmpty) return // nothing to commit; replay is a no-op too
      val next = FileManifest.latestVersion(spark, root)
        .map(_ + 1).getOrElse(0L)
      // uniquely-suffixed batch dir: a concurrent writer deriving the
      // same version number must never share a dir whose Overwrite
      // write would wipe this batch's files before the conditional
      // commit even gets to fail
      val dataDir = s"$root/data/b$next-" +
        java.util.UUID.randomUUID.toString.take(8)
      // field ids: the first batch mints the table's id map; later
      // batches re-stamp the committed schema's ids onto their files
      val sinkDataFields = org.apache.spark.sql.types.StructType(
        df.schema.fields.filterNot(f => partCols.contains(f.name)))
      val sinkIdSchema: Option[StructType] =
        if (next == 0L) Some(FileManifest.assignFieldIds(sinkDataFields))
        else FileManifest.schemaAt(spark, root)
      val stamped = sinkIdSchema.fold(df)(
        FileManifest.stampFieldIds(df, _))
      FileManifest.writePartitionedLayout(stamped, dataDir, partCols,
        clusterCol, numFiles)
      // WRITE-TIME CONSTRAINTS: the micro-batch must satisfy every
      // declared CHECK before its conditional commit — a violating
      // batch refuses atomically and FAILS THE QUERY (never
      // partial-lands); the operator fixes the stream and restarts,
      // and recovery replays the batch against the same gate
      if (next > 0L)
        FileManifest.enforceConstraints(spark, root,
          spark.read.parquet(dataDir), s"streaming batch $batchId",
          cleanup = () => {
            val dfs = new Path(dataDir).getFileSystem(
              spark.sparkContext.hadoopConfiguration)
            dfs.delete(new Path(dataDir), true); ()
          })
      val fresh = FileManifest.buildPartitioned(spark, dataDir, clusterCol)
      val sinkSchemaMeta: Map[String, String] =
        if (next == 0L) sinkIdSchema.map(s => Map("schema" -> s.json,
          "maxFieldId" -> FileManifest.schemaMaxFieldId(s).toString))
          .getOrElse(Map.empty)
        else Map.empty // inherited forward by commitVersion
      val pm =
        if (next == 0L) fresh
        else {
          val cur = FileManifest.loadLatest(spark, root)
          require(cur.column == clusterCol,
            s"sink clusterBy '$clusterCol' != table's '${cur.column}'")
          cur.copy(partitions =
            fresh.partitions.foldLeft(cur.partitions) {
              case (acc, (part, files)) =>
                acc.updated(part, acc.getOrElse(part, Nil) ++ files)
            })
        }
      // conditional on the head the manifest merged FROM: a racing
      // commit fails this batch loudly (the engine retries) instead of
      // being silently dropped from the new head
      FileManifest.commitVersion(spark, pm, root,
        meta = Map("operation" -> "streaming-append",
          BatchKey -> batchId.toString) ++
          queryId.map(QueryKey -> _) ++ sinkSchemaMeta,
        expected = Some(next))
      maxCommitted(queryId) = batchId
    }

  private var warned = false
  private def logWarnOnce(msg: String): Unit =
    if (!warned) { warned = true; System.err.println(s"[warn] $msg") }

  override def toString: String = s"GraftStreamSink[$root]"
}

/** Parquet in both directions. The WRITE side is only ever reached by
  * Spark's generic file insert (InsertIntoHadoopFsRelationCommand),
  * whose output path is the index's `rootPaths` head — the STAGING
  * directory, never the data tree — so plain parquet writing is safe
  * here: rows stay invisible until [[ManifestFileIndex.refresh]]
  * adopts the staged files and commits the catalog version. */
final class GraftParquetFileFormat extends ParquetFileFormat

/** The catalog-backed `FileIndex`: one entry per (partition, file)
  * from the committed manifest snapshot, pruned at list time.
  * Driver-side state is the manifest itself — one row per FILE, the
  * cardinality a catalog is supposed to have (§[[FileManifest
  * .buildManifest]]), stat'ed once per directory at construction. */
final class ManifestFileIndex(spark: SparkSession,
    pm: FileManifest.PartitionedManifest,
    catalogRoot: Option[String] = None,
    timeTraveled: Boolean = false) extends FileIndex {
  require(pm.partitions.nonEmpty, "empty catalog")

  // the CURRENT snapshot this index serves — advanced by refresh()
  // when an INSERT INTO's staged files are adopted and committed
  @volatile private var pmCur: FileManifest.PartitionedManifest = pm

  // ---- the SQL DML seam (graft.plans.GraftDml) ----------------------
  private[graft] def graftCatalogRoot: Option[String] = catalogRoot
  private[graft] def isTimeTraveled: Boolean = timeTraveled
  private[graft] def clusterColumn: String = pmCur.column
  private[graft] def partitionColumn: String = partColName
  private[graft] def partitionColumns: Seq[String] = partColNames
  private[graft] def currentSnapshot: FileManifest.PartitionedManifest = pmCur
  /** Serve a just-committed snapshot: the session's cached relation
    * reads the new version without re-resolution (the refresh()
    * discipline, reused by DELETE/UPDATE commands). */
  private[graft] def advanceSnapshot(
      pm2: FileManifest.PartitionedManifest): Unit = {
    // the partition-column TYPES were inferred from the construction
    // snapshot and are baked into this relation's resolved schema; an
    // adopted directory whose value no longer round-trips under that
    // ladder (e.g. `p=007` on an int-inferred level) would mis-coerce
    // or throw deep inside listFiles — refuse HERE, loudly, instead
    val t2 = inferPartTypes(pm2)
    require(t2 == partTypes,
      s"adopted partition values change the inferred partition-column " +
        s"types (${partTypes.mkString(", ")} -> ${t2.mkString(", ")}) " +
        s"under the resolved schema; re-resolve the table (new reader) " +
        s"to pick up the widened types")
    pmCur = pm2
    statusByPath = statFiles(pm2)
  }

  // "<col>=<value>[/<col2>=<value2>…]" — the (possibly Hive-nested)
  // dynamic-partition directory encoding the layout writer produced
  // and the catalog recorded verbatim; one directory LEVEL per
  // partition column. Catalog KEYS stay in the on-disk (Hive-escaped)
  // domain end-to-end; every decode to LOGICAL values unescapes here,
  // so `p = '2024-01-01 12:00:00'` (written as `12%3A00%3A00` on disk)
  // prunes, reads back, and routes DML correctly.
  private val partColNames: Seq[String] =
    pm.partitions.keysIterator.next().split('/').toSeq
      .map(s => ExternalCatalogUtils.unescapePathName(s.split("=", 2)(0)))
  private val partColName = partColNames.head
  private def partValues(key: String): Seq[String] = {
    val segs = key.split('/').toSeq
    require(segs.size == partColNames.size,
      s"catalog key `$key` does not match the ${partColNames.size}-level " +
        s"partitioning (${partColNames.mkString(", ")})")
    segs.map(s => ExternalCatalogUtils.unescapePathName(s.split("=", 2)(1)))
  }

  // partition column TYPES, inferred per level from the
  // directory-encoded values by Spark's own partition-discovery ladder
  // (int → long → string, canonical round-trip only so "007" stays a
  // string): a numeric partition column written through the front door
  // surfaces with its numeric type instead of silently diverging.
  // Re-validated by advanceSnapshot: an adopted INSERT directory whose
  // value breaks the inferred ladder refuses loudly instead of
  // mis-coercing on the cached index.
  private def inferPartTypes(m: FileManifest.PartitionedManifest)
      : Seq[org.apache.spark.sql.types.DataType] =
    partColNames.indices.map { i =>
      val vs = m.partitions.keysIterator.map(k => partValues(k)(i)).toSeq
      def canonInt(s: String) = s.toIntOption.exists(_.toString == s)
      def canonLong(s: String) = s.toLongOption.exists(_.toString == s)
      if (vs.forall(canonInt)) org.apache.spark.sql.types.IntegerType
      else if (vs.forall(canonLong)) org.apache.spark.sql.types.LongType
      else StringType
    }
  private val partTypes: Seq[org.apache.spark.sql.types.DataType] =
    inferPartTypes(pm)
  private def partRowValues(key: String): Seq[Any] =
    partValues(key).zip(partTypes).map {
      case (v, org.apache.spark.sql.types.IntegerType) => v.toInt
      case (v, org.apache.spark.sql.types.LongType) => v.toLong
      case (v, _) => UTF8String.fromString(v)
    }

  // one listStatus per partition directory (bounded: |partitions|
  // driver calls over a side table, not a per-file RPC storm)
  private def statFiles(m: FileManifest.PartitionedManifest)
      : Map[String, FileStatus] = {
    val conf = spark.sparkContext.hadoopConfiguration
    m.partitions.valuesIterator.flatten.map(_.path).toSeq
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
  @volatile private var statusByPath: Map[String, FileStatus] =
    statFiles(pm)

  // ---- INSERT INTO staging ------------------------------------------
  //
  // rootPaths IS the write contract: Spark's generic file insert uses
  // it as the job output path, so pointing it at a staging directory
  // under the CATALOG root keeps every generic write out of the data
  // tree. refresh() — which the insert command calls after a
  // successful write — then adopts the staged files transactionally.
  // The sentinel file detects INSERT OVERWRITE: its static pre-delete
  // wipes the staging dir (sentinel included) before writing, which
  // refresh refuses loudly instead of mis-reading as an append.
  //
  // The staging dir is PER INDEX INSTANCE (`s-<uuid>` under the shared
  // `_insert_staging` root): two concurrent INSERTs resolved through
  // different relation instances (other sessions, re-resolved plans)
  // stage into different directories, so one insert's adopt+sweep can
  // never eat another's in-flight `_temporary` task output or adopt
  // its files. Arming (mkdirs + sentinel create) is BEST-EFFORT at
  // construction: on read-only storage it quietly fails and the table
  // stays fully readable — only an actual INSERT then errors (its job
  // cannot write either). Instance dirs an insert never used are tiny
  // (one empty sentinel); [[FileManifest.gcOrphans]] sweeps the whole
  // staging root under its documented no-concurrent-writers contract.
  private val stagingDir: Option[Path] =
    catalogRoot.map(r => new Path(
      s"$r/${FileManifest.StagingRootName}/s-${java.util.UUID.randomUUID}"))
  private val SentinelName = "_graft_append_sentinel"
  private val SuccessName = "_SUCCESS"

  private def hfs(p: Path) =
    p.getFileSystem(spark.sparkContext.hadoopConfiguration)

  @volatile private var stagingArmed = false
  stagingDir.foreach { d =>
    try {
      val fs = hfs(d)
      fs.mkdirs(d)
      fs.createNewFile(new Path(d, SentinelName)) // idempotent
      stagingArmed = true
    } catch {
      case _: java.io.IOException => stagingArmed = false // read-only FS
    }
  }

  override val rootPaths: Seq[Path] = stagingDir match {
    case Some(d) => Seq(d)
    case None =>
      // the batch root sits one level above the partition KEY's
      // directory chain (levels = partition column count)
      Seq(partColNames.indices.foldLeft(
        new Path(pm.partitions.valuesIterator.flatten.next().path)
          .getParent)((p, _) => p.getParent))
  }

  override val partitionSchema: StructType =
    StructType(partColNames.zip(partTypes).map { case (c, t) =>
      StructField(c, t, nullable = true) })

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

  /** Bind a partition-column predicate against this index's partition
    * row — each referenced column by its LEVEL ordinal (the
    * PartitioningAwareFileIndex discipline). */
  private def boundPartPredicate(
      partitionFilters: Seq[Expression]): InternalRow => Boolean =
    if (partitionFilters.isEmpty) _ => true
    else {
      val bound = Predicate.createInterpreted(
        partitionFilters.reduce(org.apache.spark.sql.catalyst
          .expressions.And).transform {
          case a: AttributeReference if partColNames.contains(a.name) =>
            BoundReference(partColNames.indexOf(a.name),
              partTypes(partColNames.indexOf(a.name)), nullable = true)
        })
      bound.eval(_)
    }

  /** METADATA-ONLY aggregate fold for [[graft.plans
    * .GraftMetadataCountRule]]: per GROUP (the distinct typed values
    * of `groupCols` — partition columns, so the groups ARE directory
    * keys; Nil = one global group), the exact row count and
    * clustering-column [min, max] of the snapshot entries surviving a
    * partition-only predicate. EXACT, not conservative: partition
    * values are directory-encoded (every row in a directory has that
    * value), per-file rows are footer-exact, and every manifest
    * entry's range is backed by at least one non-null value (the
    * build-time hasNonNullValue require), so the fold equals the
    * scan; an empty survivor set returns NO groups (the SQL GROUP BY
    * answer — the rule handles the one-row global case itself).
    * Driver work is O(files) over the snapshot the planner already
    * holds. Group key values use internal representations (the
    * LocalRelation the rule emits is an internal-row relation). */
  private[graft] def metadataGroups(partPredicate: Option[Expression],
      groupCols: Seq[String])
      : Seq[(Seq[Any], graft.plans.GraftMetadataStats)] = {
    val keep = boundPartPredicate(partPredicate.toSeq)
    val ordinals = groupCols.map(partColNames.indexOf)
    require(ordinals.forall(_ >= 0), s"not partition columns: $groupCols")
    val kept = pmCur.partitions.toSeq.filter { case (key, _) =>
      keep(InternalRow(partRowValues(key): _*)) }
    kept
      .groupBy { case (key, _) =>
        val vs = partRowValues(key); ordinals.map(vs(_)) }
      .toSeq
      .map { case (keyVals, entries) =>
        val files = entries.flatMap(_._2)
        (keyVals, graft.plans.GraftMetadataStats(
          rows = files.map(_.rows).sum,
          min = if (files.isEmpty) None else Some(files.map(_.min).min),
          max = if (files.isEmpty) None else Some(files.map(_.max).max)))
      }
      .sortBy(_._1.map(String.valueOf).mkString("\u0000"))
  }

  override def listFiles(partitionFilters: Seq[Expression],
      dataFilters: Seq[Expression]): Seq[PartitionDirectory] = {
    val keep: InternalRow => Boolean = boundPartPredicate(partitionFilters)
    val (lo, hi) = boundsOf(dataFilters)
    pmCur.partitions.toSeq.sortBy(_._1).flatMap { case (key, files) =>
      val row = InternalRow(partRowValues(key): _*)
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

  /** Adopt any staged INSERT INTO files into the next catalog version
    * — the transactional tail of Spark's generic file insert, which
    * calls refresh() exactly once after a successful job commit. With
    * nothing staged this is a plain no-op (the semantics every other
    * refresh caller expects). Synchronized: concurrent INSERTs through
    * the SAME relation instance share one staging dir, so their
    * adopt+sweep tails must not interleave (their in-flight task
    * output lives under `_temporary`, which adoption and the sweep
    * both leave alone). */
  override def refresh(): Unit = synchronized {
    stagingDir.foreach(adoptStaged)
  }

  private def adoptStaged(d: Path): Unit = {
    val root = catalogRoot.get
    val fs = hfs(d)
    if (!fs.exists(d)) { // wiped externally: re-arm, nothing staged
      if (stagingArmed) {
        fs.mkdirs(d); fs.createNewFile(new Path(d, SentinelName))
      } // never armed (read-only FS): stay a read-only no-op
    } else {
      val entries = fs.listStatus(d).toSeq
      // committer internals (`_temporary` task output of an in-flight
      // job) are NEVER adopted and NEVER swept — only committed
      // partition dirs (col=value) are ours to move
      val stagedDirs = entries.filter(e =>
        e.isDirectory && !e.getPath.getName.startsWith("_"))
      val sentinel = entries.exists(_.getPath.getName == SentinelName)
      val jobCommitted = entries.exists(e =>
        e.isFile && e.getPath.getName == SuccessName)
      def cleanStaging(): Unit = {
        stagedDirs.foreach(s => fs.delete(s.getPath, true))
        // drop the job-commit marker too: it must never vouch for a
        // LATER job's partial output
        entries.filter(e => e.isFile && e.getPath.getName == SuccessName)
          .foreach(e => fs.delete(e.getPath, false))
        fs.createNewFile(new Path(d, SentinelName))
      }
      if (stagedDirs.isEmpty) {
        if (!sentinel) fs.createNewFile(new Path(d, SentinelName))
      } else if (timeTraveled) {
        cleanStaging()
        sys.error("INSERT INTO a time-traveled graft table (version/" +
          "timestampAsOf) is not allowed — inserts append to the LATEST " +
          "snapshot only; drop the pin and re-create the table")
      } else if (!sentinel) {
        // the static overwrite pre-delete took the sentinel with it:
        // this was INSERT OVERWRITE — refusing beats silently treating
        // it as an append, and nothing was lost (only staging was wiped)
        cleanStaging()
        sys.error("INSERT OVERWRITE a graft table is not supported — " +
          "physical overwrite would break the versions time travel " +
          "reads; use df.write.format(\"graft\").mode(\"overwrite\"), " +
          "the logical-replacement path that commits a new version")
      } else if (spark.conf
          .get("spark.sql.sources.partitionOverwriteMode", "STATIC")
          .equalsIgnoreCase("dynamic")) {
        // dynamic overwrite leaves no pre-delete trace, so an overwrite
        // would be indistinguishable from an append here — refuse while
        // the conf is set rather than guess
        cleanStaging()
        sys.error("graft INSERT with " +
          "spark.sql.sources.partitionOverwriteMode=dynamic is " +
          "ambiguous (append and overwrite stage identically); set the " +
          "mode to static (the default) for INSERT INTO")
      } else if (!jobCommitted) {
        // staged partition dirs without the committer's `_SUCCESS`
        // marker are the residue of a FAILED write (committer v2 or a
        // crash after some tasks committed): the user's INSERT already
        // errored, so adopting the partials would commit rows the user
        // was told never landed — discard them and re-arm instead
        cleanStaging()
      } else {
        // WRITE-TIME CONSTRAINTS: the staged batch must satisfy every
        // declared CHECK before anything moves — a violating INSERT
        // refuses atomically (rows were never visible; staging is
        // swept and re-armed, so the table is untouched)
        FileManifest.enforceConstraints(spark, root,
          spark.read.option("basePath", d.toString)
            .parquet(stagedDirs.map(_.getPath.toString).sorted: _*),
          "INSERT INTO", cleanup = () => cleanStaging())
        // adopt-by-move into a fresh immutable batch dir (uniquely
        // suffixed — a concurrent writer computing the same version
        // number must never share a dir whose Overwrite would wipe
        // these files), footer-stat only the moved files, then a
        // CONDITIONAL one-marker commit with optimistic retry:
        // appends commute, so losing the version race just re-folds
        // the already-moved stats onto the fresh head — committing
        // unconditionally would base the manifest on a stale head and
        // silently drop the concurrent version's files
        val next = FileManifest.latestVersion(spark, root).get + 1
        val dataDir = s"$root/data/b$next-" +
          java.util.UUID.randomUUID.toString.take(8)
        val added = FileManifest.adoptBatchAdded(spark, dataDir,
          d.toString, pmCur.column)
        var attempt = 0
        var done = false
        while (!done) {
          attempt += 1
          val adopted = FileManifest.foldAdded(
            FileManifest.loadLatest(spark, root), added)
          val expect = FileManifest.latestVersion(spark, root).get + 1
          try {
            FileManifest.commitVersion(spark, adopted, root,
              meta = Map("operation" -> "insert"),
              expected = Some(expect))
            pmCur = adopted
            statusByPath = statFiles(adopted)
            done = true
          } catch {
            case e: FileManifest.CommitConflictException =>
              if (attempt >= 8) throw e
          }
        }
        // sweep what adopt leaves behind: the drained partition dirs
        // and this job's `_SUCCESS` marker (so it can never vouch for
        // a later job's partials); `_temporary` stays untouched
        cleanStaging()
      }
    }
  }

  override def sizeInBytes: Long = statusByPath.values.map(_.getLen).sum
}
