package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.example.{ExampleParquetWriter, GroupReadSupport}
import org.apache.parquet.hadoop.util.HadoopOutputFile
import org.apache.parquet.schema.{MessageType, MessageTypeParser}
import org.apache.spark.sql.SparkSession

/** Driver-side parquet IO for SIDECAR tables — the bounded metadata
  * every index keeps next to its data (stats rows, centroids,
  * codebooks, frozen ranges). These are O(clusters)/O(1) rows by
  * contract, yet going through `spark.read`/`df.write` costs 2–4 Spark
  * job round-trips per touch (schema inference, collect, committer),
  * which profiling showed is a large share of every index-serving
  * query's wall time. Reading and writing them directly keeps the SAME
  * standard parquet layout on disk (Spark can still scan the files,
  * and files written by Spark earlier read back fine — including
  * Spark's 3-level LIST encoding, which [[addLongs]]/[[getLongs]]
  * mirror), so only the transport changes, never the format.
  */
private[graft] object DriverParquet {

  def schema(s: String): MessageType = MessageTypeParser.parseMessageType(s)

  /** Overwrite `dir` with a single parquet file holding `rows`.
    * Crash-safe ordering: the new file is fully written under a
    * tmp name readers ignore (dot-prefixed, non-`.parquet`), the old
    * contents are deleted only after the writer closes, and the tmp
    * renames into the final name LAST — a reader can race an
    * in-flight overwrite and see the old file or (after a crash
    * between delete and rename) a loudly-missing one, but never a
    * truncated file under the final name. */
  def overwrite(spark: SparkSession, dir: String, mt: MessageType)
      (fill: SimpleGroupFactory => Seq[Group]): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    fs.mkdirs(d)
    val tmp = new Path(d, ".part-00000.parquet.tmp")
    fs.delete(tmp, false) // crashed-attempt debris
    val w = ExampleParquetWriter
      .builder(HadoopOutputFile.fromPath(tmp, conf))
      .withConf(conf).withType(mt).build()
    try fill(new SimpleGroupFactory(mt)).foreach(w.write)
    finally w.close()
    fs.listStatus(d).foreach { st =>
      if (st.isFile && st.getPath.getName != tmp.getName)
        fs.delete(st.getPath, false)
    }
    require(fs.rename(tmp, new Path(d, "part-00000.parquet")),
      s"DriverParquet: rename $tmp failed")
  }

  /** Every row of every parquet file directly under `dir` (sidecars
    * are bounded by contract — this is a driver-side value). */
  def read(spark: SparkSession, dir: String): Seq[Group] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val d = new Path(dir)
    val fs = d.getFileSystem(conf)
    val out = Seq.newBuilder[Group]
    fs.listStatus(d).toSeq
      .filter(st => st.isFile && st.getPath.getName.endsWith(".parquet"))
      .map(_.getPath).sortBy(_.getName)
      .foreach { f =>
        val r = org.apache.parquet.hadoop.ParquetReader
          .builder(new GroupReadSupport(), f).withConf(conf).build()
        try {
          var g = r.read()
          while (g != null) { out += g; g = r.read() }
        } finally r.close()
      }
    out.result()
  }

  /** Spark's standard 3-level LIST encoding, parquet-schema side:
    * `optional group <name> (LIST) { repeated group list {
    * optional <t> element; } }` — what `ArrayType` columns serialize
    * to, so mixed writers interoperate. */
  def listField(name: String, elemType: String): String =
    s"optional group $name (LIST) { repeated group list { " +
      s"optional $elemType element; } }"

  def addLongs(g: Group, field: String, vs: Array[Long]): Unit = {
    val lg = g.addGroup(field)
    vs.foreach(v => lg.addGroup("list").add("element", v))
  }

  def addDoubles(g: Group, field: String, vs: Array[Double]): Unit = {
    val lg = g.addGroup(field)
    vs.foreach(v => lg.addGroup("list").add("element", v))
  }

  def getLongs(g: Group, field: String): Array[Long] = {
    val lg = g.getGroup(field, 0)
    val n = lg.getFieldRepetitionCount("list")
    Array.tabulate(n)(i => lg.getGroup("list", i).getLong("element", 0))
  }

  def getDoubles(g: Group, field: String): Array[Double] = {
    val lg = g.getGroup(field, 0)
    val n = lg.getFieldRepetitionCount("list")
    Array.tabulate(n)(i => lg.getGroup("list", i).getDouble("element", 0))
  }

  /** Whether `field` is present (with a value) on this row — covers
    * schema drift between sidecar generations (e.g. a stats column
    * added later reads as absent on old files). */
  def has(g: Group, field: String): Boolean =
    g.getType.containsField(field) &&
      g.getFieldRepetitionCount(field) > 0

  /** An integral field as Long whatever its physical width — old
    * Spark-written sidecars carry partition-derived columns as int32
    * where the driver writer uses int64. */
  def anyLong(g: Group, field: String): Long =
    g.getType.getType(field).asPrimitiveType().getPrimitiveTypeName match {
      case org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.INT32 =>
        g.getInteger(field, 0).toLong
      case _ => g.getLong(field, 0)
    }
}
