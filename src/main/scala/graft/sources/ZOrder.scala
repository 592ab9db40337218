package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) clustering: interleave the bits of two key
  * columns and lay the table out sorted by the interleaved value, so
  * file-level min/max stats stay tight on BOTH dimensions at once.
  *
  * Why it matters at 100 TB: a 1-D sort makes manifests selective on
  * one column and useless on every other; most real scan predicates
  * are boxes (user range x time range, key range x value range). The
  * Morton curve maps 2-D locality to 1-D locality, so the same
  * [[FileManifest]] machinery prunes on both axes — no new read-path
  * code, just a better layout decided at write time.
  *
  * The z-value is a pure codegen'd column expression (a sum of
  * disjoint shifted bits — addition == OR here), with an exact DuckDB
  * mirror for oracle checks.
  */
object ZOrder {
  /** Bit-interleaved Morton value: x's bit i lands at position 2i,
    * y's at 2i+1. Both inputs must be non-negative and < 2^bits. */
  def zValue(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, "bits must be in [1, 31]")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc +
        shiftleft(shiftright(x, i).bitwiseAND(lit(1L)), 2 * i) +
        shiftleft(shiftright(y, i).bitwiseAND(lit(1L)), 2 * i + 1)
    }
  }

  /** DuckDB mirror of [[zValue]] for oracle SQL. */
  def zValueSql(x: String, y: String, bits: Int): String =
    s"""CAST(list_sum(list_transform(range(0, $bits), i ->
       |  ((($x >> i) & 1) << (2*i)) + ((($y >> i) & 1) << (2*i+1))))
       |  AS BIGINT)""".stripMargin

  /** Write `df` z-ordered on (xCol, yCol): range-repartition + sort by
    * the Morton value so each file covers a compact 2-D tile. The
    * helper z column is dropped — the layout is the artifact.
    *
    * Raw column values make a lopsided curve when the dimensions span
    * different bit widths (the wider one dominates the high bits and
    * the "2-D" layout degenerates into a 1-D sort), so each dimension
    * is first scaled to `bits` bits over its own [min, max] — exact
    * integer arithmetic, deterministic, and the stats pass is a single
    * 4-value aggregate (production systems use rank buckets for the
    * same purpose; linear scaling keeps this collect-free and exact). */
  def writeZOrdered(df: DataFrame, path: String, xCol: String, yCol: String,
      bits: Int, numFiles: Int): Unit = {
    val r = df.agg(min(col(xCol)).cast("long"), max(col(xCol)).cast("long"),
      min(col(yCol)).cast("long"), max(col(yCol)).cast("long")).head
    def scaled(c: Column, lo: Long, hi: Long): Column =
      if (hi == lo) lit(0L)
      else (c.cast("long") - lit(lo)) * lit(1L << bits) / lit(hi - lo + 1)
    val z = zValue(scaled(col(xCol), r.getLong(0), r.getLong(1)),
      scaled(col(yCol), r.getLong(2), r.getLong(3)), bits)
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)
  }

  /** Box-predicate read over a laid-out table: prune the file list
    * with one manifest per dimension (survivors = intersection; all
    * manifests come from ONE footer pass), then re-apply the exact box
    * filter on the survivors. A box outside the data is a legitimately
    * empty result, not an error. */
  def readBox(spark: SparkSession, dir: String,
      dims: Seq[(String, Long, Long)]): DataFrame = {
    require(dims.nonEmpty)
    val manifests = FileManifest.buildManifests(spark, dir, dims.map(_._1))
    require(manifests(dims.head._1).nonEmpty, s"no parquet files in $dir")
    val surviving = dims.map { case (c, lo, hi) =>
      FileManifest.prune(manifests(c), lo, hi).map(_.path).toSet
    }.reduce(_ intersect _)
    val src =
      if (surviving.nonEmpty) spark.read.parquet(surviving.toSeq.sorted: _*)
      else spark.read.parquet(manifests(dims.head._1).head.path)
        .where(lit(false))
    dims.foldLeft(src) {
      case (df, (c, lo, hi)) => df.filter(col(c) >= lo && col(c) <= hi)
    }
  }
}
