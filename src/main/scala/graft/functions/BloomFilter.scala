package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{BinaryType, BooleanType, DataType}

/** Bloom-filter build + probe for broadcast SEMI-JOIN PREFILTERING.
  *
  * The 100 TB decontamination/membership shape: the small side (a
  * benchmark's n-grams, a blocklist, yesterday's keys) aggregates into
  * one fixed-size bit array (mergeable map-side, shuffle carries
  * `numBits/8` bytes per partial), which then broadcasts to the big
  * side as a scan-level filter — corpus rows drop BEFORE any shuffle,
  * at a false-positive rate ~(1-e^(-kn/m))^k, and zero false
  * negatives, so an exact join on the survivors reproduces the exact
  * result while only candidate rows ever leave the scan stage.
  *
  * Both sides consume PRE-HASHED 64-bit keys (Spark's codegen'd
  * `xxhash64(...)` column), so the aggregate's input row and the
  * probe expression stay inside whole-stage codegen; bit positions
  * come from standard double hashing (h1 + i*h2 over the splitmix
  * remix of the key).
  */
case class BloomAgg(child: Expression, numBits: Int, numHashes: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {
  require(numBits >= 64 && numBits % 64 == 0, "numBits must be a positive multiple of 64")
  require(numHashes >= 1 && numHashes <= 16)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](numBits / 64)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) GraftHash.bloomSet(buf, v.asInstanceOf[Long], numHashes)
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val bytes = new Array[Byte](buf.length * 8)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    buf.foreach(bb.putLong)
    bytes
  }

  override def serialize(buf: Array[Long]): Array[Byte] = eval(buf).asInstanceOf[Array[Byte]]

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Long](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = bb.getLong; i += 1 }
    out
  }

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): BloomAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BloomAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BloomAgg =
    copy(child = c)
  override def prettyName: String = "bloom_agg"
}

/** Probe: true iff all `numHashes` bit positions for the 64-bit key
  * are set in the serialized filter. Codegen'd (static helper call),
  * so a bloom prefilter sits inside the scan's WholeStageCodegen. */
case class BloomMightContain(left: Expression, right: Expression, numHashes: Int)
    extends BinaryExpression {
  require(numHashes >= 1 && numHashes <= 16)
  override def dataType: DataType = BooleanType
  override def nullSafeEval(bloom: Any, hash: Any): Any =
    GraftHash.bloomMightContain(bloom.asInstanceOf[Array[Byte]],
      hash.asInstanceOf[Long], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (b, h) => s"graft.functions.GraftHash.bloomMightContain($b, $h, $numHashes)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): BloomMightContain =
    copy(left = l, right = r)
  override def prettyName: String = "bloom_might_contain"
}

private[functions] object BloomBits {
  /** Double-hashing bit positions: h1 + i*h2 over remixed halves of
    * the input hash; h2 forced odd so positions cycle the full space. */
  @inline def position(key: Long, i: Int, numBits: Int): Int = {
    val h1 = GraftHash.mix(key)
    val h2 = GraftHash.mix(key ^ 0x5851f42d4c957f2dL) | 1L
    // mask the sign, then mod the bit count
    (((h1 + i.toLong * h2) & Long.MaxValue) % numBits).toInt
  }
}
