package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream, DataInputStream, ByteArrayInputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra-Gries heavy-hitters sketch: bounded-state frequent-items
  * counting with mergeable partials.
  *
  * The buffer holds at most `capacity` (item, count) counters. Inserting
  * an unseen item into a full buffer decrements every counter instead
  * (dropping zeros) — the classic MG step. Merging sums counters, then
  * if over capacity subtracts the (capacity+1)-th largest count from
  * all and drops the non-positive — the mergeable-summaries result, so
  * partial aggregation works map-side and the shuffle carries at most
  * `capacity` counters per group no matter the corpus size.
  *
  * Guarantees: estimated count ∈ [true − N/(capacity+1), true] for
  * every item (N = group size); any item with true frequency above
  * N/(capacity+1) is guaranteed present. When the group's distinct
  * cardinality never exceeds `capacity`, no decrement ever fires and
  * every count is EXACT — the regime the DuckDB oracle checks; the
  * estimating regime is covered by the error-bound property spec.
  */
case class HeavyHitters(child: Expression, capacity: Int, topN: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.HashMap[String, Long]]
  with UnaryLike[Expression] {
  require(capacity >= 1 && topN >= 1)

  override def createAggregationBuffer(): java.util.HashMap[String, Long] =
    new java.util.HashMap[String, Long]()

  override def update(buf: java.util.HashMap[String, Long],
      input: InternalRow): java.util.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      val item = v.toString
      val cur = buf.get(item)
      if (cur != 0L || buf.containsKey(item)) buf.put(item, cur + 1L)
      else if (buf.size < capacity) buf.put(item, 1L)
      else decrementAll(buf, 1L)
    }
    buf
  }

  /** Subtract `d` from every counter, dropping the non-positive. */
  private def decrementAll(buf: java.util.HashMap[String, Long], d: Long): Unit = {
    val it = buf.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      if (e.getValue <= d) it.remove() else e.setValue(e.getValue - d)
    }
  }

  override def merge(a: java.util.HashMap[String, Long],
      b: java.util.HashMap[String, Long]): java.util.HashMap[String, Long] = {
    b.forEach { (k, v) =>
      val cur = a.get(k) // missing key unboxes to 0L
      a.put(k, cur + v)
    }
    if (a.size > capacity) {
      // (capacity+1)-th largest count; subtracting it leaves at most
      // `capacity` strictly-positive counters
      val counts = new Array[Long](a.size)
      var i = 0
      val it = a.values().iterator()
      while (it.hasNext) { counts(i) = it.next(); i += 1 }
      java.util.Arrays.sort(counts)
      val d = counts(counts.length - capacity - 1)
      decrementAll(a, d)
    }
    a
  }

  /** Top-n surviving counters as array<struct<item,count>>, ordered by
    * (count desc, item asc) so the output is deterministic. */
  override def eval(buf: java.util.HashMap[String, Long]): Any = {
    val entries = new scala.collection.mutable.ArrayBuffer[(String, Long)](buf.size)
    buf.forEach((k, v) => entries += ((k, v)))
    val top = entries.sortBy { case (item, cnt) => (-cnt, item) }.take(topN)
    new GenericArrayData(top.map { case (item, cnt) =>
      InternalRow(UTF8String.fromString(item), cnt)
    }.toArray[Any])
  }

  override def serialize(buf: java.util.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed UTF-8 (writeUTF would throw past 64 KiB — a
    // single unbroken blob token must not fail the shuffle stage)
    buf.forEach { (k, v) =>
      val b = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(b.length); out.write(b); out.writeLong(v)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val m = new java.util.HashMap[String, Long](n * 2)
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val b = new Array[Byte](len)
      in.readFully(b)
      m.put(new String(b, java.nio.charset.StandardCharsets.UTF_8),
        in.readLong())
      i += 1
    }
    m
  }

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("count", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): HeavyHitters =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HeavyHitters =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HeavyHitters =
    copy(child = c)
  override def prettyName: String = "heavy_hitters"
}
