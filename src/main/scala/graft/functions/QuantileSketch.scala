package graft.functions

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.ByteBuffer

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Mergeable quantile-sketch state: KLL-style level buffers. Level ℓ
  * holds items of weight 2^ℓ; level 0 receives raw updates. When a
  * level overflows `k` items it compacts: sort, keep alternate items
  * (starting offset flips per compaction — the deterministic stand-in
  * for KLL's coin flip, so runs are reproducible), promote the keepers
  * one level up. Below `k` total items NOTHING ever compacts and the
  * sketch is EXACT — the regime the verify-scale oracle checks; the
  * estimating regime's rank error is spec-bounded empirically.
  */
final class KllState(val k: Int) {
  val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(ArrayBuffer.empty[Double])
  var parity: Int = 0

  def insert(v: Double): Unit = { levels(0) += v; compactOverflows() }

  def mergeWith(other: KllState): Unit = {
    while (levels.length < other.levels.length) levels += ArrayBuffer.empty[Double]
    var l = 0
    while (l < other.levels.length) { levels(l) ++= other.levels(l); l += 1 }
    parity ^= other.parity
    compactOverflows()
  }

  private def compactOverflows(): Unit = {
    var l = 0
    while (l < levels.length) {
      if (levels(l).length > k) {
        val sorted = levels(l).sortInPlace()
        val keep = ArrayBuffer.empty[Double]
        var i = parity & 1
        while (i < sorted.length) { keep += sorted(i); i += 2 }
        parity += 1
        levels(l).clear()
        if (l + 1 >= levels.length) levels += ArrayBuffer.empty[Double]
        levels(l + 1) ++= keep
      }
      l += 1
    }
  }

  /** Weighted-rank quantile: sort all (value, 2^level) pairs by value;
    * quantile q is the value covering 0-based weighted position
    * floor(q*(W-1) + 0.5). With all weights 1 this is exactly the
    * round-half-up index into the sorted values — the rule the DuckDB
    * oracle mirrors with list_sort + indexing. */
  def quantiles(probs: Array[Double]): Array[Double] = {
    var n = 0
    levels.foreach(n += _.length)
    if (n == 0) return probs.map(_ => Double.NaN)
    val vs = new Array[Double](n)
    val ws = new Array[Long](n)
    var idx = 0
    var l = 0
    while (l < levels.length) {
      val w = 1L << l
      levels(l).foreach { v => vs(idx) = v; ws(idx) = w; idx += 1 }
      l += 1
    }
    // index sort by value
    val order = (0 until n).sortBy(i => vs(i))
    var total = 0L
    ws.foreach(total += _)
    probs.map { q =>
      val target = math.floor(q * (total - 1) + 0.5).toLong
      var cum = 0L
      var i = 0
      var out = vs(order(n - 1))
      var found = false
      while (i < n && !found) {
        cum += ws(order(i))
        if (cum > target) { out = vs(order(i)); found = true }
        i += 1
      }
      out
    }
  }
}

/** Grouped quantile estimates as array<double> (one slot per requested
  * prob). Mergeable bounded state (≤ ~2k doubles whatever the group
  * size), partial-aggregation friendly — the 100 TB shape for
  * per-group percentiles without a sort of the group's data. */
case class KllQuantiles(child: Expression, k: Int, probs: Seq[Double],
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllState] with UnaryLike[Expression] {
  require(k >= 8, "k >= 8")
  require(probs.nonEmpty && probs.forall(p => p >= 0.0 && p <= 1.0))

  override def createAggregationBuffer(): KllState = new KllState(k)

  override def update(buf: KllState, input: InternalRow): KllState = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: KllState, b: KllState): KllState = { a.mergeWith(b); a }

  override def eval(buf: KllState): Any =
    new GenericArrayData(buf.quantiles(probs.toArray))

  override def serialize(buf: KllState): Array[Byte] = {
    val bos = new ByteArrayOutputStream(); val out = new DataOutputStream(bos)
    out.writeInt(buf.parity)
    out.writeInt(buf.levels.length)
    buf.levels.foreach { lvl =>
      out.writeInt(lvl.length)
      lvl.foreach(out.writeDouble)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): KllState = {
    val bb = ByteBuffer.wrap(bytes)
    val st = new KllState(k)
    st.parity = bb.getInt
    val nLevels = bb.getInt
    st.levels.clear()
    var l = 0
    while (l < nLevels) {
      val n = bb.getInt
      val lvl = new ArrayBuffer[Double](n)
      var i = 0
      while (i < n) { lvl += bb.getDouble; i += 1 }
      st.levels += lvl
      l += 1
    }
    if (st.levels.isEmpty) st.levels += ArrayBuffer.empty[Double]
    st
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): KllQuantiles =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): KllQuantiles =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): KllQuantiles =
    copy(child = c)
  override def prettyName: String = "kll_quantiles"
}
