package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.hadoop.fs.Path

import graft.operators.Expectations
import graft.sources.FileManifest

/** CONTINUOUS WRITE-AUDIT-PUBLISH into the graft table format — the
  * streaming write path the batch-only front door lacked: a document/
  * event stream lands as per-micro-batch ATOMIC catalog commits, every
  * batch is audited BEFORE publication, and main-branch readers only
  * ever see audited data. This is c5's WAP loop
  * (stage → audit branch → expectations gate → fastForward) driven by
  * Structured Streaming instead of hand-rolled cycles.
  *
  * Exactly-once across replays (the TextIndex.appendBatch discipline,
  * TextIndex.scala, applied to TABLE versions): each micro-batch's
  * commit is bound to its (checkpoint runId, batchId) by ONE atomic
  * tag create (`ingest-<run>-<batch>` → version). The write order is
  *
  *   1. stage the batch under `stage/<run>-<batch>` (Overwrite — a
  *      replayed stage rewrites, never duplicates),
  *   2. adopt-by-move onto the CURRENT main snapshot and commit the
  *      next catalog version (commitVersion's own marker is atomic),
  *   3. create the batch tag — the linearization point: from here the
  *      batch IS committed exactly once,
  *   4. finish publication idempotently (audit branch advance →
  *      increment audit → fastForward or rejected-tag).
  *
  * A crash BEFORE step 3 leaves at most an untagged orphan version no
  * ref ever points at (invisible to every read; reclaimed by
  * expireVersions + gcOrphans) and the replay redoes 1-3 with fresh
  * file names; a crash AFTER step 3 makes the replay skip straight to
  * step 4, whose actions are all guarded by current ref state
  * (advance only if behind, audit only if neither published nor
  * rejected) — re-running them is a no-op.
  *
  * The audit reads ONLY the batch increment (the committed version's
  * files minus the published head's — O(batch) IO however large the
  * table has grown, the property that keeps a 100 TB table's ingest
  * audit from becoming a full-table scan), through the catalog's own
  * file listing with partition values restored from the directory
  * encoding, so what is audited is byte-identical to what a
  * main-branch reader would be served after publication.
  */
object GovernedIngest {
  /** The governed table's fixed shape for one ingest pipeline. */
  final case class Table(vroot: String, tableRoot: String,
      stageRoot: String, partCol: String, clusterCol: String,
      checks: Seq[Expectations.Check], numFiles: Int = 4)

  /** Initialize the catalog: base snapshot (possibly empty) committed
    * as v0 with `main` and `audit` branches pointing at it. */
  def init(spark: SparkSession, t: Table, base: DataFrame): Long = {
    FileManifest.writePartitionedLayout(base, t.tableRoot, t.partCol,
      t.clusterCol, t.numFiles)
    val pm = FileManifest.buildPartitioned(spark, t.tableRoot, t.clusterCol)
    val v0 = FileManifest.commitVersion(spark, pm, t.vroot)
    FileManifest.createBranch(spark, t.vroot, "main", v0)
    FileManifest.createBranch(spark, t.vroot, "audit", v0)
    v0
  }

  private def ingestTag(runTag: String, batchId: Long) =
    s"ingest-$runTag-$batchId"
  private def rejectedTag(runTag: String, batchId: Long) =
    s"rejected-$runTag-$batchId"

  /** One micro-batch's stage+commit+audit+publish — shared verbatim by
    * [[wapStream]]'s per-batch closure and the batch-replay query
    * (c9), so the streaming path cannot drift from the oracle-checked
    * batch path (the GovernedEnrich discipline). Returns the version
    * this batch is committed as (existing one on replay). */
  def ingestBatch(spark: SparkSession, t: Table, batch: DataFrame,
      runTag: String, batchId: Long): Long = {
    require(runTag.matches("[A-Za-z0-9._-]+"), s"bad runTag '$runTag'")
    val tag = ingestTag(runTag, batchId)
    val v =
      if (FileManifest.refExists(spark, t.vroot, tag))
        FileManifest.resolveRef(spark, t.vroot, tag) // replayed: committed
      else {
        val stageDir = s"${t.stageRoot}/$runTag-$batchId"
        val fs = new Path(stageDir).getFileSystem(
          spark.sparkContext.hadoopConfiguration)
        fs.delete(new Path(stageDir), true) // crashed-attempt leftovers
        FileManifest.writePartitionedLayout(batch, stageDir, t.partCol,
          t.clusterCol, t.numFiles)
        val base = FileManifest.loadRef(spark, t.vroot, "main")
        val pm = FileManifest.adoptBatch(spark, base, t.tableRoot, stageDir)
        val vNew = FileManifest.commitVersion(spark, pm, t.vroot)
        FileManifest.createTag(spark, t.vroot, tag, vNew) // atomic binding
        vNew
      }
    finishPublish(spark, t, v, runTag, batchId)
    v
  }

  /** Steps after the committed version exists — each guarded by ref
    * state so a replay re-runs them as no-ops. */
  private def finishPublish(spark: SparkSession, t: Table, v: Long,
      runTag: String, batchId: Long): Unit = {
    // terminal states FIRST: a stale replay (later batches already
    // processed) must not move the audit branch backward
    if (FileManifest.refExists(spark, t.vroot, rejectedTag(runTag, batchId)))
      return // audited and rejected — terminal
    if (FileManifest.resolveRef(spark, t.vroot, "main") >= v)
      return // audited and published (or superseded) — terminal
    if (FileManifest.resolveRef(spark, t.vroot, "audit") != v)
      FileManifest.advanceBranch(spark, t.vroot, "audit", v)
    if (incrementViolations(spark, t, v) == 0L)
      FileManifest.fastForward(spark, t.vroot, "main", "audit")
    else
      FileManifest.createTag(spark, t.vroot, rejectedTag(runTag, batchId), v)
  }

  /** Expectation violations over the INCREMENT between the committed
    * version and the published head: exactly this batch's adopted
    * files, read through the catalog listing with the partition
    * column restored from the directory encoding — O(batch) IO. */
  private def incrementViolations(spark: SparkSession, t: Table,
      v: Long): Long = {
    val cur = FileManifest.loadVersion(spark, t.vroot, v)
    val pub = FileManifest.loadRef(spark, t.vroot, "main")
    val pubPaths = pub.partitions.valuesIterator.flatten.map(_.path).toSet
    val added = cur.partitions.valuesIterator.flatten.map(_.path)
      .filterNot(pubPaths).toSeq
    if (added.isEmpty) 0L
    else Expectations.audit(
        spark.read.option("basePath", t.tableRoot).parquet(added: _*),
        t.checks)
      .agg(coalesce(sum("n_violations"), lit(0L))).head.getLong(0)
  }

  /** The continuous form: wire a stream into [[ingestBatch]]. The
    * batchId sequence is scoped to the CHECKPOINT's query id (wiping
    * the checkpoint restarts ids — exactly the event that must remap
    * tags), read the same way TextIndex.maintainStream reads it. */
  def wapStream(docs: DataFrame, t: Table, checkpointDir: String)
      : StreamingQuery =
    docs.writeStream
      .foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row],
            id: Long) =>
          ingestBatch(batch.sparkSession, t, batch.toDF(),
            runTag(batch.sparkSession, checkpointDir), id)
          ()
      }
      .option("checkpointLocation", checkpointDir)
      .start()

  /** What main-branch readers are served: the published snapshot. */
  def publishedRead(spark: SparkSession, t: Table): DataFrame =
    FileManifest.readPrunedPartitioned(spark,
      FileManifest.loadRef(spark, t.vroot, "main"), None,
      Long.MinValue, Long.MaxValue)

  /** The checkpoint's query id, sanitized to a ref-name-safe token —
    * the true scope of the batchId sequence (changes when a
    * checkpoint is wiped even at the same path). */
  private[graft] def runTag(spark: SparkSession,
      checkpointDir: String): String = {
    val meta = new Path(checkpointDir, "metadata")
    val fs = meta.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val raw =
      try {
        val in = fs.open(meta)
        val txt = try new String(in.readAllBytes(), "UTF-8")
          finally in.close()
        "\"id\"\\s*:\\s*\"([^\"]+)\"".r.findFirstMatchIn(txt)
          .map(_.group(1)).getOrElse(checkpointDir)
      } catch { case _: java.io.IOException => checkpointDir }
    raw.replaceAll("[^A-Za-z0-9._-]", "_").takeRight(12)
  }
}
