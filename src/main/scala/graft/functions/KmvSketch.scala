package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType}

/** KMV (k-minimum-values) distinct-count sketch as a
  * TypedImperativeAggregate: the buffer keeps the k smallest distinct
  * 64-bit hashes seen; the estimator is (k-1)/fraction(kth-min), and
  * below k distinct values the count is exact. Buffers merge by
  * set-union-then-truncate, so partial aggregation works map-side and
  * the shuffle carries <= k longs per group regardless of corpus size
  * — the sketch shape (mergeable bounded state) a 100 TB
  * distinct-count needs. Standard error ~ 1/sqrt(k-2).
  */
case class KmvDistinct(child: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.TreeSet[java.lang.Long]]
  with UnaryLike[Expression] {
  require(k >= 16, "k >= 16 for a meaningful estimate")

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

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KmvDistinct =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KmvDistinct =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KmvDistinct =
    copy(child = c)
  override def prettyName: String = "kmv_distinct"
}
