package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) sketch machinery shared by the aggregates
  * below: the buffer keeps the k smallest distinct 64-bit hashes seen.
  * Buffers merge by set-union-then-truncate, so partial aggregation
  * works map-side and the shuffle carries <= k longs per group
  * regardless of corpus size — the sketch shape (mergeable bounded
  * state) a 100 TB distinct-count needs. Standard error ~ 1/sqrt(k-2).
  */
abstract class KmvAggBase
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {
  def child: Expression
  def k: Int

  @transient private lazy val hasher = XxHash64(Seq(child), 42L)

  override def createAggregationBuffer(): java.util.TreeSet[java.lang.Long] =
    new java.util.TreeSet[java.lang.Long]()

  override def update(buf: java.util.TreeSet[java.lang.Long],
      input: InternalRow): java.util.TreeSet[java.lang.Long] = {
    if (child.eval(input) != null) {
      // flip the sign bit so unsigned order == natural Long order
      val h = hasher.eval(input).asInstanceOf[Long] ^ Long.MinValue
      buf.add(h)
      if (buf.size > k) buf.pollLast()
    }
    buf
  }

  override def merge(a: java.util.TreeSet[java.lang.Long],
      b: java.util.TreeSet[java.lang.Long]): java.util.TreeSet[java.lang.Long] = {
    a.addAll(b)
    while (a.size > k) a.pollLast()
    a
  }

  override def serialize(buf: java.util.TreeSet[java.lang.Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.forEach(v => out.writeLong(v))
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[java.lang.Long] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val s = new java.util.TreeSet[java.lang.Long]()
    var i = 0
    while (i < n) { s.add(bb.getLong); i += 1 }
    s
  }

  override def nullable: Boolean = false
}

/** Distinct-count estimate: (k-1)/fraction(kth-min); EXACT below k
  * distinct values. */
case class KmvDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends KmvAggBase {
  require(k >= 16, "k >= 16 for a meaningful estimate")

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val n = buf.size
    if (n < k) n.toDouble
    else {
      // stored values are sign-flipped, so signed order == unsigned
      // hash order; fraction of the hash space = stored/2^64 + 0.5
      val kth = buf.last().longValue()
      val frac = (kth.toDouble / 2.0) / 9.223372036854776e18 + 0.5
      if (frac <= 0.0) n.toDouble else (k - 1).toDouble / frac
    }
  }

  override def dataType: DataType = DoubleType
  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvDistinct =
    copy(child = c)
  override def prettyName: String = "kmv_distinct"
}

/** The raw sketch (ascending sign-flipped k-min hashes) as an
  * array<bigint> column, for downstream SET-OPERATION estimates
  * (intersection / union / Jaccard across groups via `kmv_overlap`) —
  * the multiset-operation side of the published KMV synopses work. */
case class KmvValues(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends KmvAggBase {
  require(k >= 16, "k >= 16 for a meaningful estimate")

  override def eval(buf: java.util.TreeSet[java.lang.Long]): Any = {
    val out = new Array[Long](buf.size)
    var i = 0
    val it = buf.iterator()
    while (it.hasNext) { out(i) = it.next(); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(
      org.apache.spark.sql.types.LongType, containsNull = false)
  override def withNewMutableAggBufferOffset(o: Int): KmvValues =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvValues =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvValues =
    copy(child = c)
  override def prettyName: String = "kmv_values"
}
