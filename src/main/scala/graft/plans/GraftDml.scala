package graft.plans

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteFromTable, LogicalPlan, SubqueryAlias, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{coalesce, col, input_file_name, lit, not, when}
import org.apache.spark.sql.graftshim.SparkShims

import graft.sources.{FileManifest, ManifestFileIndex}

/** SQL-surface row-level DML for graft tables — `DELETE FROM t WHERE …`
  * and `UPDATE t SET … WHERE …` through the same front door CREATE
  * TABLE … USING graft opened (the Delta/Iceberg user expectation:
  * a table format without SQL DML is a library, not a table).
  *
  * Architecture: Spark's analyzer fully resolves `DeleteFromTable` /
  * `UpdateTable` over the v1 relation and only PLANNING refuses them
  * (verified: the refusal fires in DataSourceV2Strategy /
  * BasicOperators), so [[GraftDmlRule]] — injected as a post-hoc
  * resolution rule via [[GraftExtensions]] — replaces the resolved
  * node with a runnable command BEFORE planning sees it. The command
  * routes onto the engine's proven copy-on-write discipline
  * (the f6/f7 rewrite shape) against the COMMITTED catalog:
  *
  *  1. PRUNE — the predicate's partition conjuncts drop whole
  *     directories and its clustering-column bounds drop every file
  *     whose footer [min,max] cannot match, exactly the listFiles
  *     seam reads use (the index itself answers, so DML IO is decided
  *     by the same catalog that decides scan IO).
  *  2. TOUCH — one scan of the surviving candidates finds the files
  *     that actually contain matching rows (`input_file_name`), the
  *     Delta two-phase shape: a predicate that matches nothing
  *     rewrites nothing.
  *  3. REWRITE — touched files rewrite one-to-one into the next
  *     version's immutable batch directory (a file's surviving rows
  *     are a subset of its rows, so per-file rewrite keeps the
  *     clustering ranges tight); untouched files carry verbatim.
  *  4. COMMIT — one atomic catalog version; every pre-DML version
  *     stays time-travelable, and the serving index advances in place
  *     so the session's next SELECT reads the new snapshot.
  *
  * Refused loudly: DML on a time-traveled table, UPDATE of the
  * partition or clustering column (rewritten rows could leave their
  * directory / file key range — a real format re-clusters instead),
  * and a DELETE that would empty the table (an empty catalog has no
  * schema sample to serve readers; `DROP TABLE` is the honest spell).
  *
  * At 100 TB: phases 1-2 read only pruned candidates once; phase 3
  * reads+writes only files that contain matching rows. Worst case
  * (predicate matches everywhere) degrades to the full CoW rewrite
  * every CoW format pays; MoR equality deletes (f13) remain the
  * engine-level alternative for delete-heavy workloads.
  */
object GraftDml extends PredicateHelper {

  /** Strip aliases down to the graft relation, if this is one. */
  private[plans] def graftRelation(plan: LogicalPlan)
      : Option[(HadoopFsRelation, ManifestFileIndex)] = plan match {
    case SubqueryAlias(_, child) => graftRelation(child)
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation => h.location match {
        case m: ManifestFileIndex => Some((h, m))
        case _ => None
      }
      case _ => None
    }
    case _ => None
  }

  /** Resolved catalyst predicate → Column usable on a FRESH read of
    * the same table (attribute ids re-resolve by name). */
  private def asColumn(e: Expression): Column =
    SparkShims.column(e.transform {
      case a: AttributeReference => UnresolvedAttribute.quoted(a.name)
    })

  /** The shared CoW rewrite: `sets` empty = DELETE (drop matching
    * rows), non-empty = UPDATE (transform matching rows). Returns the
    * committed version. */
  private[plans] def cowRewriteCommit(spark: SparkSession,
      index: ManifestFileIndex, cond: Expression,
      sets: Seq[(String, Expression)], dataCols: Seq[String]): Long = {
    val root = index.graftCatalogRoot.getOrElse(sys.error(
      "graft DML requires a catalog-backed table (CREATE TABLE … USING " +
        "graft OPTIONS (path '<catalogRoot>'))"))
    require(!index.isTimeTraveled,
      "DML on a time-traveled graft table (version/timestampAsOf) is not " +
        "allowed — writes land on the LATEST snapshot only; drop the pin " +
        "and re-create the table")
    val partCol = index.partitionColumn
    val clusterCol = index.clusterColumn
    sets.foreach { case (name, _) =>
      require(name != partCol && name != clusterCol,
        s"UPDATE of the ${if (name == partCol) "partition" else "clustering"} " +
          s"column `$name` is not supported — rewritten rows could leave " +
          "their directory/file key range and the catalog would mis-prune; " +
          "re-cluster via df.write.format(\"graft\").mode(\"overwrite\")")
    }

    // 0. SYNC to the committed head: the cached relation may be
    // behind commits made outside this session's table (an external
    // writer's append) — a DML decided on a stale snapshot would
    // commit a version that silently DROPS those files. The index
    // advances first, so pruning, touch detection, and the carried
    // manifest all read the same latest version.
    index.advanceSnapshot(FileManifest.loadLatest(spark, root))

    // 1. PRUNE through the index's own listing seam: partition
    // conjuncts drop directories, clustering bounds drop files
    val conjuncts = splitConjunctivePredicates(cond)
    val (partFilters, dataFilters) = conjuncts.partition(c =>
      c.references.nonEmpty && c.references.forall(_.name == partCol))
    val candidates = index.listFiles(partFilters, dataFilters)
      .flatMap(_.files.map(_.getPath.toString))
    if (candidates.isEmpty) return FileManifest.latestVersion(spark, root).get

    def norm(s: String): String = new Path(s).toUri.getPath
    // every batch dir is its own basePath (immutable data/b<N> roots —
    // one basePath cannot span versions); group and union, restoring
    // the directory-encoded partition column for the predicate
    def readRestored(files: Seq[String]) = files
      .groupBy(f => new Path(f).getParent.getParent.toString)
      .toSeq.sortBy(_._1)
      .map { case (base, group) =>
        spark.read.option("basePath", base).parquet(group.sorted: _*)
      }
      .reduce(_.unionByName(_))

    // 2. TOUCH: which candidates actually hold matching rows. The
    // collect is O(touched file names) — catalog-scale, never rows
    val condCol = asColumn(cond)
    val touched = readRestored(candidates)
      .where(condCol)
      .select(input_file_name().as("f")).distinct()
      .collect().map(r => norm(r.getString(0))).toSet
    val pm = index.currentSnapshot
    if (touched.isEmpty) return FileManifest.latestVersion(spark, root).get

    // 3. REWRITE touched files one-to-one into the next immutable
    // batch dir (per-file parallel, the deleteRange discipline)
    val next = FileManifest.latestVersion(spark, root).get + 1
    val dataDir = s"$root/data/b$next"
    val fs = new Path(root).getFileSystem(
      spark.sparkContext.hadoopConfiguration)
    val touchedList = pm.partitions.toSeq.sortBy(_._1).flatMap {
      case (part, files) => files.filter(f => touched(norm(f.path)))
        .map(f => (part, f.path))
    }
    import scala.concurrent.{Await, ExecutionContext, Future}
    implicit val ec: ExecutionContext = ExecutionContext.global
    val jobs = touchedList.zipWithIndex.map { case ((part, path), i) =>
      Future {
        val base = new Path(path).getParent.getParent.toString
        val one = spark.read.option("basePath", base).parquet(path)
        val out =
          if (sets.isEmpty) one.where(not(coalesce(condCol, lit(false))))
          else one.select(one.columns.toSeq.map { c =>
            sets.find(_._1 == c) match {
              case Some((_, v)) =>
                when(condCol, asColumn(v)).otherwise(col(c)).as(c)
              case None => col(c)
            }
          }: _*)
        val tmp = f"$dataDir/_rw_$i%05d"
        out.select(dataCols.map(col): _*) // drop the restored partition
          // column — directory encoding carries it, data files never do
          .coalesce(1).sortWithinPartitions(clusterCol)
          .write.mode("overwrite").parquet(tmp)
        val written = fs.listStatus(new Path(tmp)).toSeq
          .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
        val moved = written.map { st =>
          val destDir = new Path(dataDir, part)
          fs.mkdirs(destDir)
          val dest = new Path(destDir, f"rw-$i%05d-${st.getPath.getName}")
          require(fs.rename(st.getPath, dest), s"DML rewrite move failed: $dest")
          fs.makeQualified(dest).toString
        }
        fs.delete(new Path(tmp), true)
        (part, moved)
      }
    }
    val rewritten = Await.result(Future.sequence(jobs),
      scala.concurrent.duration.Duration.Inf)
    val freshStats = rewritten.groupBy(_._1).map { case (part, moved) =>
      part -> FileManifest.append(Nil, spark, moved.flatMap(_._2), clusterCol)
        .filter(_.rows > 0)
    }

    // 4. COMMIT: carried files + rewritten files as one atomic version
    val carried = pm.partitions.view.mapValues(
      _.filterNot(f => touched(norm(f.path)))).toMap
    val merged = freshStats.foldLeft(carried) { case (acc, (part, stats)) =>
      acc.updated(part, (acc.getOrElse(part, Nil) ++ stats).sortBy(_.path))
    }.filter(_._2.nonEmpty)
    require(merged.nonEmpty,
      "this DELETE would remove every row — an empty graft catalog cannot " +
        "serve readers; DROP TABLE (or overwrite with a new batch) instead")
    val adopted = pm.copy(partitions = merged)
    val v = FileManifest.commitVersion(spark, adopted, root)
    require(v == next, s"DML commit raced: expected v$next, got v$v")
    index.advanceSnapshot(adopted) // the session's next SELECT sees it
    v
  }
}

/** Post-hoc resolution rule: resolved SQL DML over a graft relation
  * becomes a runnable command before planning can refuse it. */
case class GraftDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperators {
      case d @ DeleteFromTable(t, cond) if d.resolved =>
        GraftDml.graftRelation(t) match {
          case Some((h, idx)) =>
            GraftDeleteCommand(idx, cond, h.dataSchema.fieldNames.toSeq)
          case None => d
        }
      case u @ UpdateTable(t, assignments, cond) if u.resolved =>
        GraftDml.graftRelation(t) match {
          case Some((h, idx)) =>
            val sets = assignments.map {
              case Assignment(k: Attribute, v) => k.name -> v
              case Assignment(k, _) => sys.error(
                s"graft UPDATE supports top-level columns only, got: ${k.sql}")
            }
            GraftUpdateCommand(idx, sets,
              cond.getOrElse(org.apache.spark.sql.catalyst.expressions
                .Literal.TrueLiteral), h.dataSchema.fieldNames.toSeq)
          case None => u
        }
    }
}

/** `DELETE FROM t WHERE cond` — CoW rewrite + one atomic version. */
case class GraftDeleteCommand(index: ManifestFileIndex, cond: Expression,
    dataCols: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftDml.cowRewriteCommit(spark, index, cond, Nil, dataCols)
    Nil
  }
}

/** `UPDATE t SET … WHERE cond` — CoW rewrite + one atomic version. */
case class GraftUpdateCommand(index: ManifestFileIndex,
    sets: Seq[(String, Expression)], cond: Expression,
    dataCols: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    GraftDml.cowRewriteCommit(spark, index, cond, sets, dataCols)
    Nil
  }
}
