package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Dimensions

/** Streaming CDC apply: maintain a parquet snapshot table from an
  * unbounded change stream — the `foreachBatch` upsert sink that turns
  * [[Dimensions.mergeUpsert]] into a continuously-maintained dimension.
  *
  * Per micro-batch: collapse the batch to its LAST change per key (by
  * the `seqCol` ordering — a batch can carry several changes for one
  * key), merge into the current snapshot generation, write the next
  * generation, then swap directories. The swap keeps a previous
  * generation alive until the new one is in place, so a crash at any
  * point leaves a recoverable snapshot (see [[applyBatch]]); the batch
  * never reads the directory it is overwriting. Exactly-once comes
  * from the streaming checkpoint: a replayed batch re-merges
  * idempotently (changes carry absolute values, not increments).
  */
object CdcApply {
  /** Latest change per key by (seqCol desc): the batch-local collapse
    * MERGE semantics require (multiple matches per key are ambiguous). */
  def latestPerKey(changes: DataFrame, keyCol: String,
      seqCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(seqCol).desc)
    changes.withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1).drop("__rn")
  }

  /** Apply one batch of changes to the snapshot at `dir` (batch form,
    * also the foreachBatch body). Creates the snapshot on first use.
    *
    * Crash safety: the swap is rename(cur -> old); rename(next -> cur);
    * delete(old). A crash between the two renames leaves `old` intact,
    * and the recovery step below restores it before merging — the
    * snapshot can lag by one committed batch after a crash (the
    * replayed batch re-merges it) but is never lost or half-written. */
  def applyBatch(changes: DataFrame, dir: String, keyCol: String,
      deleteCol: String, seqCol: String): Unit = {
    val spark = changes.sparkSession
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    val cur = new Path(dir)
    val next = new Path(dir + ".next")
    val old = new Path(dir + ".old")
    // recover from a crash between the two swap renames: the previous
    // generation is still in `old` — restore it as current
    if (!fs.exists(cur) && fs.exists(old)) {
      require(fs.rename(old, cur), s"recovery failed: $old -> $cur")
    }
    val collapsed = latestPerKey(changes, keyCol, seqCol).drop(seqCol)
    val merged =
      if (fs.exists(cur)) {
        val snap = spark.read.parquet(dir)
        Dimensions.mergeUpsert(snap, collapsed, keyCol, deleteCol)
      } else {
        // first generation: surviving inserts only
        collapsed.filter(!col(deleteCol)).drop(deleteCol)
      }
    fs.delete(next, true); fs.delete(old, true)
    merged.write.mode("overwrite").parquet(next.toString)
    if (fs.exists(cur)) {
      require(fs.rename(cur, old), s"swap failed: $cur -> $old")
    }
    require(fs.rename(next, cur), s"swap failed: $next -> $cur")
    fs.delete(old, true)
  }

  /** Wire a streaming change feed into the snapshot-maintenance sink. */
  def run(changes: DataFrame, dir: String, keyCol: String,
      deleteCol: String, seqCol: String, checkpointDir: String): StreamingQuery =
    changes.writeStream
      .foreachBatch { (batch: Dataset[Row], _: Long) =>
        applyBatch(batch.toDF(), dir, keyCol, deleteCol, seqCol)
      }
      .option("checkpointLocation", checkpointDir)
      .start()
}
