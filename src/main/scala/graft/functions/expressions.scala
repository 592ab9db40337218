package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions (codegen-friendly: each `doGenCode`
  * emits a call to a static Java-compatible helper, so the expression
  * stays inside whole-stage codegen instead of falling back to
  * interpreted UDF dispatch).
  *
  * `TimestampToString` re-expresses the reference's scalar UDF
  * (reference: TimestampToString.java:9-16, registered in
  * StreamingJob.java:90). The rest back the LLM-pipeline operators.
  */

/** Timestamp -> "yyyy-MM-dd HH:mm:ss.SSS" (UTC). The reference UDF
  * formats with java.sql.Timestamp.toString; we fix the fractional
  * part at milliseconds so output is canonical across engines. */
case class TimestampToString(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = StringType
  override def nullSafeEval(v: Any): Any =
    GraftHash.formatTimestampMicros(v.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.formatTimestampMicros($c)")
  override protected def withNewChildInternal(c: Expression): TimestampToString = copy(child = c)
  override def prettyName: String = "timestamp_to_string"
}

/** Cosine similarity between two float/double vectors, accumulated in
  * double in index order (deterministic across runs and engines). */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.cosine(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftHash.cosine($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarity =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_similarity"
}

/** Cosine over array<double> inputs (e.g. dequantized SQ8 vectors, or
  * float vectors widened with a cast). Same accumulation order and
  * final dot/(sqrt*sqrt) as [[CosineSimilarity]], so results are
  * bit-comparable with engines computing index-ordered double cosine. */
case class CosineSimilarityD(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {
  // SQL-surface misuse (array<float> embeddings passed un-cast) must
  // fail analysis, not silently read float bytes as doubles.
  // (return type inferred: AbstractDataType itself is private[sql])
  override def inputTypes = Seq(ArrayType(DoubleType), ArrayType(DoubleType))
  override def dataType: DataType = DoubleType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.cosineD(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftHash.cosineD($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): CosineSimilarityD =
    copy(left = l, right = r)
  override def prettyName: String = "cosine_similarity_d"
}

/** Product-quantization encode (array<float|double> vector + literal
  * array<array<double>> codebook -> array<int> of `subspaces` codeword
  * indices). One tight compiled loop per row instead of the
  * O(subspaces x codewords x dims) unrolled expression tree the naive
  * Column formulation produces — same arithmetic (see
  * [[GraftHash.pqEncode]]), ~1000x less expression-eval overhead. */
case class PqEncode(vec: Expression, codebook: Expression, subspaces: Int)
    extends BinaryExpression {
  override def left: Expression = vec
  override def right: Expression = codebook
  private def floatIn: Boolean = vec.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(v: Any, b: Any): Any =
    GraftHash.pqEncode(v.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      subspaces, floatIn)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, b) =>
      s"graft.functions.GraftHash.pqEncode($v, $b, $subspaces, $floatIn)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): PqEncode =
    copy(vec = l, codebook = r)
  override def prettyName: String = "pq_encode"
}

/** 64-bit SimHash over whitespace tokens (FNV-1a feature hashes,
  * bit-vote aggregation). Near-duplicate docs land within a small
  * Hamming distance. One pass over the string, no allocation per
  * token beyond the tokenizer. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    GraftHash.simhash64(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): SimHash64 = copy(child = c)
  override def prettyName: String = "simhash64"
}

/** MinHash signature: `numHashes` min-wise hashes over `shingleWords`-
  * word shingles, using the standard two-hash family h1 + i*h2.
  * Returns array<bigint> of length numHashes; single pass over the
  * shingle set. */
case class MinHashSignature(child: Expression, shingleWords: Int, numHashes: Int)
    extends UnaryExpression {
  require(shingleWords > 0 && numHashes > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftHash.minhashSignature(v.asInstanceOf[UTF8String], shingleWords, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHash.minhashSignature($c, $shingleWords, $numHashes)")
  override protected def withNewChildInternal(c: Expression): MinHashSignature = copy(child = c)
  override def prettyName: String = "minhash_signature"
}

/** Polynomial rolling-hash fingerprint of a document (base-1000003,
  * mod 2^64, over UTF-16 code units). Stable content fingerprint for
  * exact-dup detection and shard-stable sampling. */
case class RollingHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    GraftHash.rollingHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.rollingHash($c)")
  override protected def withNewChildInternal(c: Expression): RollingHash = copy(child = c)
  override def prettyName: String = "rolling_hash"
}

/** Sorted distinct 64-bit hashes of a document's `shingleWords`-word
  * shingles — the whole shingle pipeline (tokenize, window, hash,
  * distinct, sort) in one pass with no intermediate string arrays.
  * Pairs with SortedIntersectCount for exact set-similarity joins. */
case class ShingleHashes(child: Expression, shingleWords: Int)
    extends UnaryExpression {
  require(shingleWords > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftHash.shingleHashes(v.asInstanceOf[UTF8String], shingleWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.shingleHashes($c, $shingleWords)")
  override protected def withNewChildInternal(c: Expression): ShingleHashes = copy(child = c)
  override def prettyName: String = "shingle_hashes"
}

/** Word n-gram STRINGS in document order, splitting the text exactly
  * once per row. The declarative formulation — transform(sequence(...),
  * i -> array_join(slice(split(trim(text)), i+1, n))) — inlines the
  * split into the lambda, so Catalyst re-splits the whole text for
  * every gram: O(words^2) per document (measured 3.4 s vs 0.3 s on the
  * sf0.1 corpus). Semantics match split(trim(text), '\s+') with
  * single-space joins, so DuckDB's string_split_regex mirror is exact;
  * a doc shorter than n words yields its whole text as one gram. */
case class ShingleStrings(child: Expression, shingleWords: Int)
    extends UnaryExpression {
  require(shingleWords > 0)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftHash.shingleStrings(v.asInstanceOf[UTF8String], shingleWords)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.shingleStrings($c, $shingleWords)")
  override protected def withNewChildInternal(c: Expression): ShingleStrings = copy(child = c)
  override def prettyName: String = "shingle_strings"
}

/** Intersection size of two SORTED long arrays (linear merge, no
  * allocation). Backs the exact set-similarity join: shingle sets are
  * hashed to sorted long arrays once per document, so the O(pairs)
  * verify costs ~(|a|+|b|) long comparisons per pair instead of
  * building a hash table per probe. */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.sortedIntersectCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftHash.sortedIntersectCount($a, $b)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): SortedIntersectCount =
    copy(left = l, right = r)
  override def prettyName: String = "sorted_intersect_count"
}

/** Set-operation estimates from two KMV sketches (ascending k-min hash
  * arrays from `kmv_values`): combine to the k smallest union hashes L,
  * count members of L present in both sketches (K∩), and estimate
  * Jaccard = K∩/|L|, union = (|L|-1)/frac(max L), intersection =
  * Jaccard x union — the standard KMV multiset estimators. When the
  * combined sketch holds fewer than k values, ALL distinct hashes were
  * seen and every output is EXACT (hash collisions aside), which is
  * what lets the oracle check this query at verification scale. */
case class KmvOverlap(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 16)
  override def dataType: DataType = StructType(Seq(
    StructField("jaccard_est", DoubleType, nullable = false),
    StructField("intersect_est", DoubleType, nullable = false),
    StructField("union_est", DoubleType, nullable = false)))
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.kmvOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftHash.kmvOverlap($a, $b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvOverlap =
    copy(left = l, right = r)
  override def prettyName: String = "kmv_overlap"
}

/** Theta-style sketch set algebra over two KMV sketches (the
  * `kmv_values` array form): distinct-count estimates for A∪B, A∩B,
  * A\B and B\A from one merge walk — the operation set the published
  * theta-sketch framework defines, on the KMV synopsis this engine
  * already exchanges. Exact when the combined sketch is below
  * capacity; estimator error ~ 1/sqrt(k-2) above it. */
case class KmvSetOps(left: Expression, right: Expression, k: Int)
    extends BinaryExpression {
  require(k >= 16)
  override def dataType: DataType = StructType(Seq(
    StructField("union_est", DoubleType, nullable = false),
    StructField("intersect_est", DoubleType, nullable = false),
    StructField("diff_left_est", DoubleType, nullable = false),
    StructField("diff_right_est", DoubleType, nullable = false)))
  override def nullSafeEval(a: Any, b: Any): Any =
    GraftHash.kmvSetOps(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.GraftHash.kmvSetOps($a, $b, $k)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): KmvSetOps =
    copy(left = l, right = r)
  override def prettyName: String = "kmv_set_ops"
}

/** Random-hyperplane LSH signature: `bits` sign-bits of dot products
  * with deterministic Rademacher (+-1) hyperplanes, parameterized by a
  * table index so multiple independent hash tables come from one
  * expression. Packed into a long. */
case class HyperplaneLsh(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  require(bits > 0 && bits <= 63)
  override def dataType: DataType = LongType
  override def nullSafeEval(vec: Any, table: Any): Any =
    GraftHash.hyperplaneSig(vec.asInstanceOf[ArrayData], bits, table.asInstanceOf[Int])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (v, t) => s"graft.functions.GraftHash.hyperplaneSig($v, $bits, $t)")
  override protected def withNewChildrenInternal(l: Expression, r: Expression): HyperplaneLsh =
    copy(left = l, right = r)
  override def prettyName: String = "hyperplane_lsh"
}

/** 64-bit SimHash like [[SimHash64]] but with md5-derived token
  * hashes (lower 64 bits of the digest): ~10x slower than the FNV
  * path but ENGINE-MIRRORABLE — any engine with an md5() function
  * reproduces the signature bit-for-bit (DuckDB:
  * `('0x' || substr(md5(tok),17,16))::UBIGINT`), which is what lets
  * the driver's oracle hash-check the simhash pipeline end to end.
  * Use [[SimHash64]] in latency-critical paths, this one when the
  * fingerprint must be portable across engines. */
case class Md5SimHash(child: Expression)
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(v: Any): Any =
    GraftHash.md5SimHash(v.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.GraftHash.md5SimHash($c)")
  override protected def withNewChildInternal(c: Expression): Md5SimHash = copy(child = c)
  override def prettyName: String = "md5_simhash64"
}

/** MinHash signature like [[MinHashSignature]] but engine-mirrorable:
  * shingle hash basis (h1, h2) = (upper, lower|1) 64 bits of
  * md5(gram string), slot j = min over grams of (h1 + (j+1)*h2)
  * mod 2^63 (kept below 2^63 so signed and unsigned minima agree
  * across engines). Grams are the canonical single-space-joined word
  * n-grams of `shingleStrings`, so DuckDB's
  * `string_split_regex + list_transform` mirror is exact. */
case class Md5MinHash(child: Expression, shingleWords: Int, numHashes: Int)
    extends UnaryExpression {
  require(shingleWords > 0 && numHashes > 0)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(v: Any): Any =
    GraftHash.md5MinHashSignature(v.asInstanceOf[UTF8String], shingleWords, numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.GraftHash.md5MinHashSignature($c, $shingleWords, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Md5MinHash = copy(child = c)
  override def prettyName: String = "md5_minhash_signature"
}

/** Static helpers referenced from generated code (must be public,
  * static-reachable, and JVM-name stable). */
/** Argmax-cosine centroid assignment for the quantized k-means: q (a
  * long array) against the trained centroids, returning the winning
  * centroid id. Centroids ride along as REFERENCE DATA (three plain
  * arrays in the codegen references, one virtual call per row), so the
  * generated method stays a few lines at ANY k — unrolling k*dim
  * multiply terms into the expression tree dies at codegen's method
  * limits near k~100, and the higher-order-function formulation
  * (transform/aggregate over an array literal) is interpreted per row
  * (measured 15.5 s vs 1.9 s for d11 at sf0.1, k=79).
  *
  * Bit-exact contract (what makes the DuckDB CTE oracle hash-match):
  * integer dot and norms in index order (exact in long), cosine =
  * dot / sqrt(na * nb) in double, ties -> lowest centroid id, NaN
  * ranks above every number (Spark/DuckDB sort semantics). `cids`
  * must be ascending. */
/** Minimum squared-L2 distance from q (a long array) to a seed set —
  * the farthest-point seeding kernel. Same reference-data design as
  * [[CentroidArgmax]]: seeds ride in the codegen references, the
  * generated method is a tight loop at any seed count. All integer
  * arithmetic (quantized inputs), so the distance is exact in a long
  * and bit-identical across engines/partitionings. */
case class CentroidMinDist(child: Expression, vecs: Array[Array[Long]])
    extends UnaryExpression {
  require(vecs.nonEmpty)
  override def dataType: DataType = LongType
  override def nullSafeEval(q: Any): Any =
    GraftHash.centroidMinDist(q.asInstanceOf[ArrayData], vecs)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecsRef = ctx.addReferenceObj("vecs", vecs, "long[][]")
    defineCodeGen(ctx, ev, q =>
      s"graft.functions.GraftHash.centroidMinDist($q, $vecsRef)")
  }
  override protected def withNewChildInternal(c: Expression): CentroidMinDist =
    copy(child = c)
  override def prettyName: String = "centroid_min_dist"
}

case class CentroidArgmax(child: Expression, cids: Array[Long],
    vecs: Array[Array[Long]], norms: Array[Double])
    extends UnaryExpression {
  require(cids.length == vecs.length && cids.length == norms.length &&
    cids.nonEmpty)
  override def dataType: DataType = LongType
  override def nullSafeEval(q: Any): Any =
    GraftHash.centroidArgmax(q.asInstanceOf[ArrayData], cids, vecs, norms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val vecsRef = ctx.addReferenceObj("vecs", vecs, "long[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    defineCodeGen(ctx, ev, q =>
      s"graft.functions.GraftHash.centroidArgmax($q, $cidsRef, $vecsRef, $normsRef)")
  }
  override protected def withNewChildInternal(c: Expression): CentroidArgmax =
    copy(child = c)
  override def prettyName: String = "centroid_argmax"
}

/** The WINNING cosine from the same scan [[CentroidArgmax]] runs —
  * identical loop, identical tie/NaN rules, so `(argmax, maxcos)`
  * computed as two map-only expressions against the same reference
  * arrays always describe the same winner. Used by the balanced
  * assignment, whose acceptance ranking needs the score, not just the
  * id. */
case class CentroidMaxCos(child: Expression, cids: Array[Long],
    vecs: Array[Array[Long]], norms: Array[Double])
    extends UnaryExpression {
  require(cids.length == vecs.length && cids.length == norms.length &&
    cids.nonEmpty)
  override def dataType: DataType = DoubleType
  override def nullSafeEval(q: Any): Any =
    GraftHash.centroidMaxCos(q.asInstanceOf[ArrayData], vecs, norms)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vecsRef = ctx.addReferenceObj("vecs", vecs, "long[][]")
    val normsRef = ctx.addReferenceObj("norms", norms, "double[]")
    defineCodeGen(ctx, ev, q =>
      s"graft.functions.GraftHash.centroidMaxCos($q, $vecsRef, $normsRef)")
  }
  override protected def withNewChildInternal(c: Expression): CentroidMaxCos =
    copy(child = c)
  override def prettyName: String = "centroid_max_cos"
}

object GraftHash {
  /** See [[CentroidMinDist]]. */
  def centroidMinDist(q: ArrayData, vecs: Array[Array[Long]]): Long = {
    val qa = q.toLongArray()
    val dim = qa.length
    var best = Long.MaxValue
    var c = 0
    while (c < vecs.length) {
      val v = vecs(c)
      var d = 0L
      var j = 0
      while (j < dim) { val t = qa(j) - v(j); d += t * t; j += 1 }
      if (d < best) best = d
      c += 1
    }
    best
  }

  /** See [[CentroidArgmax]]. Ascending-cid iteration + strictly-greater
    * keeps the lowest id on ties; a NaN cosine (zero query norm) beats
    * every number and the first NaN wins, matching the struct-max /
    * SQL ORDER BY ... DESC semantics of the previous formulation. */
  def centroidArgmax(q: ArrayData, cids: Array[Long],
      vecs: Array[Array[Long]], norms: Array[Double]): Long = {
    val qa = q.toLongArray()
    val dim = qa.length
    var na = 0L
    var i = 0
    while (i < dim) { na += qa(i) * qa(i); i += 1 }
    var bestCid = cids(0)
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < vecs.length) {
      val v = vecs(c)
      var dot = 0L
      var j = 0
      while (j < dim) { dot += qa(j) * v(j); j += 1 }
      val cos = dot.toDouble / math.sqrt(na.toDouble * norms(c))
      if (!java.lang.Double.isNaN(bestCos) &&
          (java.lang.Double.isNaN(cos) || cos > bestCos)) {
        bestCos = cos; bestCid = cids(c)
      }
      c += 1
    }
    bestCid
  }

  /** See [[CentroidMaxCos]]: the winning cosine of the
    * [[centroidArgmax]] scan (same loop, same NaN-wins rule). */
  def centroidMaxCos(q: ArrayData, vecs: Array[Array[Long]],
      norms: Array[Double]): Double = {
    val qa = q.toLongArray()
    val dim = qa.length
    var na = 0L
    var i = 0
    while (i < dim) { na += qa(i) * qa(i); i += 1 }
    var bestCos = Double.NegativeInfinity
    var c = 0
    while (c < vecs.length) {
      val v = vecs(c)
      var dot = 0L
      var j = 0
      while (j < dim) { dot += qa(j) * v(j); j += 1 }
      val cos = dot.toDouble / math.sqrt(na.toDouble * norms(c))
      if (!java.lang.Double.isNaN(bestCos) &&
          (java.lang.Double.isNaN(cos) || cos > bestCos)) bestCos = cos
      c += 1
    }
    bestCos
  }

  private val FNV_OFFSET = 0xcbf29ce484222325L
  private val FNV_PRIME = 0x100000001b3L

  /** FNV-1a over a UTF8String's bytes, finalized with a xorshift-
    * multiply avalanche (splitmix64 finalizer). */
  def fnv1a(s: UTF8String): Long = {
    val bytes = s.getBytes
    var h = FNV_OFFSET
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= FNV_PRIME
      i += 1
    }
    mix(h)
  }

  def mix(v: Long): Long = {
    var z = v + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def formatTimestampMicros(micros: Long): UTF8String = {
    val secs = Math.floorDiv(micros, 1000000L)
    val frac = Math.floorMod(micros, 1000000L)
    val ldt = java.time.LocalDateTime.ofEpochSecond(secs, (frac * 1000L).toInt,
      java.time.ZoneOffset.UTC)
    val ms = frac / 1000L
    val sb = new java.lang.StringBuilder(23)
    pad(sb, ldt.getYear, 4); sb.append('-')
    pad(sb, ldt.getMonthValue, 2); sb.append('-')
    pad(sb, ldt.getDayOfMonth, 2); sb.append(' ')
    pad(sb, ldt.getHour, 2); sb.append(':')
    pad(sb, ldt.getMinute, 2); sb.append(':')
    pad(sb, ldt.getSecond, 2); sb.append('.')
    pad(sb, ms.toInt, 3)
    UTF8String.fromString(sb.toString)
  }

  private def pad(sb: java.lang.StringBuilder, v: Int, width: Int): Unit = {
    val s = Integer.toString(v)
    var i = s.length
    while (i < width) { sb.append('0'); i += 1 }
    sb.append(s)
  }

  /** Double-accumulated cosine over float arrays, index order. */
  def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def cosineD(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a.getDouble(i)
      val y = b.getDouble(i)
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  def simhash64(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    val s = text.toString
    var start = 0
    val len = s.length
    while (start < len) {
      while (start < len && Character.isWhitespace(s.charAt(start))) start += 1
      var end = start
      while (end < len && !Character.isWhitespace(s.charAt(end))) end += 1
      if (end > start) {
        val h = hashRange(s, start, end)
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      start = end
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  private def hashRange(s: String, from: Int, until: Int): Long = {
    var h = FNV_OFFSET
    var i = from
    while (i < until) {
      val c = s.charAt(i)
      h ^= (c & 0xffL); h *= FNV_PRIME
      h ^= ((c >>> 8) & 0xffL); h *= FNV_PRIME
      i += 1
    }
    mix(h)
  }

  /** MinHash over word shingles. Signature slot i takes
    * min over shingles of (h1 + (i+1)*h2) where (h1, h2) are two
    * independent mixes of the shingle hash. */
  def minhashSignature(text: UTF8String, shingleWords: Int, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val s = text.toString
    // tokenize: offsets of word starts/ends
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val st = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > st) { starts += st; ends += i }
    }
    val nTok = starts.length
    val nShingles = math.max(nTok - shingleWords + 1, if (nTok > 0) 1 else 0)
    var k = 0
    while (k < nShingles) {
      // hash the span from start of token k to end of token k+w-1
      val last = math.min(k + shingleWords - 1, nTok - 1)
      val h = hashRange(s, starts(k), ends(last))
      val h1 = mix(h)
      val h2 = mix(h ^ 0x5851f42d4c957f2dL) | 1L
      var j = 0
      while (j < numHashes) {
        val g = h1 + (j + 1).toLong * h2
        if (g < sig(j)) sig(j) = g
        j += 1
      }
      k += 1
    }
    new GenericArrayData(sig)
  }

  /** Single-pass sorted distinct shingle hashes (see ShingleHashes). */
  def shingleHashes(text: UTF8String, shingleWords: Int): ArrayData = {
    val s = text.toString
    val starts = new scala.collection.mutable.ArrayBuffer[Int]()
    val ends = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    val len = s.length
    while (i < len) {
      while (i < len && Character.isWhitespace(s.charAt(i))) i += 1
      val st = i
      while (i < len && !Character.isWhitespace(s.charAt(i))) i += 1
      if (i > st) { starts += st; ends += i }
    }
    val nTok = starts.length
    val nShingles = math.max(nTok - shingleWords + 1, if (nTok > 0) 1 else 0)
    val hs = new Array[Long](nShingles)
    var k = 0
    while (k < nShingles) {
      val last = math.min(k + shingleWords - 1, nTok - 1)
      hs(k) = hashRange(s, starts(k), ends(last))
      k += 1
    }
    java.util.Arrays.sort(hs)
    // in-place dedup of the sorted hashes
    var out = 0
    var j = 0
    while (j < nShingles) {
      if (out == 0 || hs(j) != hs(out - 1)) { hs(out) = hs(j); out += 1 }
      j += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(hs, out))
  }

  private val WS = java.util.regex.Pattern.compile("\\s+")

  /** See ShingleStrings: trim spaces (SQL trim), split \s+ once, emit
    * n-gram strings joined by single spaces. */
  def shingleStrings(text: UTF8String, n: Int): ArrayData = {
    var s = text.toString
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s = s.substring(b, e)
    val words = WS.split(s, -1)
    if (words.length < n) {
      new GenericArrayData(Array[Any](UTF8String.fromString(words.mkString(" "))))
    } else {
      val out = new Array[Any](words.length - n + 1)
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) { if (j > 0) sb.append(' '); sb.append(words(i + j)); j += 1 }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  /** See KmvOverlap. Inputs are ascending sign-flipped k-min hashes. */
  def kmvOverlap(a: ArrayData, b: ArrayData, k: Int): InternalRow = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var kk = 0; var inter = 0; var last = 0L
    while (kk < k && (i < n || j < m)) {
      val x = if (i < n) a.getLong(i) else Long.MaxValue
      val y = if (j < m) b.getLong(j) else Long.MaxValue
      if (x == y) { inter += 1; last = x; i += 1; j += 1 }
      else if (x < y) { last = x; i += 1 }
      else { last = y; j += 1 }
      kk += 1
    }
    if (kk == 0) return new GenericInternalRow(Array[Any](0.0, 0.0, 0.0))
    val jac = inter.toDouble / kk.toDouble
    if (kk < k) {
      // combined sketch below capacity: every distinct hash was seen,
      // all three outputs are exact (no estimator rounding)
      new GenericInternalRow(Array[Any](jac, inter.toDouble, kk.toDouble))
    } else {
      val frac = (last.toDouble / 2.0) / 9.223372036854776e18 + 0.5
      val unionEst = if (frac <= 0.0) kk.toDouble else (kk - 1).toDouble / frac
      new GenericInternalRow(Array[Any](jac, jac * unionEst, unionEst))
    }
  }

  /** Full KMV set algebra over two sorted sign-flipped sketches: the
    * theta-sketch operation set (union / intersection / A-minus-B /
    * B-minus-A distinct-count estimates) from one merge walk over the
    * combined k-minimum synopsis. Below combined capacity every count
    * is exact (all distinct hashes retained); at capacity each class
    * count scales by union_est / k — the standard KMV multiset
    * estimator. */
  def kmvSetOps(a: ArrayData, b: ArrayData, k: Int): InternalRow = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var kk = 0
    var inter = 0; var da = 0; var db = 0; var last = 0L
    while (kk < k && (i < n || j < m)) {
      val x = if (i < n) a.getLong(i) else Long.MaxValue
      val y = if (j < m) b.getLong(j) else Long.MaxValue
      if (x == y) { inter += 1; last = x; i += 1; j += 1 }
      else if (x < y) { da += 1; last = x; i += 1 }
      else { db += 1; last = y; j += 1 }
      kk += 1
    }
    if (kk == 0)
      return new GenericInternalRow(Array[Any](0.0, 0.0, 0.0, 0.0))
    if (kk < k) {
      // combined sketch below capacity: exact counts, no estimator
      new GenericInternalRow(Array[Any](
        kk.toDouble, inter.toDouble, da.toDouble, db.toDouble))
    } else {
      val frac = (last.toDouble / 2.0) / 9.223372036854776e18 + 0.5
      val unionEst = if (frac <= 0.0) kk.toDouble else (kk - 1).toDouble / frac
      val scale = unionEst / kk.toDouble
      new GenericInternalRow(Array[Any](
        unionEst, inter * scale, da * scale, db * scale))
    }
  }

  def sortedIntersectCount(a: ArrayData, b: ArrayData): Int = {
    val n = a.numElements(); val m = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < n && j < m) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** Sign-bit signature of `bits` Rademacher hyperplane projections;
    * hyperplane element (table, bit, j) is +-1 from a splitmix of the
    * three indices — deterministic, no stored model. */
  def hyperplaneSig(vec: ArrayData, bits: Int, table: Int): Long = {
    val n = vec.numElements()
    var sig = 0L
    var b = 0
    while (b < bits) {
      var dot = 0.0
      var j = 0
      while (j < n) {
        val h = mix(table.toLong * 0x9e3779b97f4a7c15L +
          b.toLong * 0xc2b2ae3d27d4eb4fL + j.toLong)
        val r = if ((h & 1L) == 0L) 1.0 else -1.0
        dot += r * vec.getFloat(j)
        j += 1
      }
      if (dot >= 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Set the double-hashed bit positions of `key` (see BloomBits). */
  def bloomSet(buf: Array[Long], key: Long, numHashes: Int): Unit = {
    val numBits = buf.length * 64
    var i = 0
    while (i < numHashes) {
      val p = BloomBits.position(key, i, numBits)
      buf(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  /** Probe a serialized (big-endian longs) bloom filter. */
  def bloomMightContain(bloom: Array[Byte], key: Long, numHashes: Int): Boolean = {
    val numBits = bloom.length * 8
    var i = 0
    while (i < numHashes) {
      val p = BloomBits.position(key, i, numBits)
      val byteIdx = (p >>> 6) * 8 + 7 - ((p & 63) >>> 3)
      if (((bloom(byteIdx) >>> (p & 7)) & 1) == 0) return false
      i += 1
    }
    true
  }

  private val MD5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  // md5(token/gram) is a pure function and corpora repeat their tokens
  // heavily, so a bounded thread-local memo removes most digest work
  // from the md5-basis fingerprints WITHOUT changing a single output
  // bit (the whole point of the md5 basis is engine-mirrorable hashes;
  // a cache keeps them identical, just cheaper). Bounded at 64k
  // entries per executor thread (~few MB); cleared, not evicted, when
  // full — the memo is only a speedup, never state.
  private val MD5_MEMO = new ThreadLocal[java.util.HashMap[String, (Long, Long)]] {
    override def initialValue(): java.util.HashMap[String, (Long, Long)] =
      new java.util.HashMap[String, (Long, Long)]()
  }

  private def md5HalvesCached(s: String): (Long, Long) = {
    val memo = MD5_MEMO.get()
    var v = memo.get(s)
    if (v == null) {
      v = md5Halves(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (memo.size >= (1 << 16)) memo.clear()
      memo.put(s, v)
    }
    v
  }

  /** (upper 64, lower 64) bits of md5(s as UTF-8), big-endian — the
    * same split DuckDB's `substr(md5(x), 1, 16)` / `substr(.., 17, 16)`
    * hex halves decode to. */
  private def md5Halves(bytes: Array[Byte]): (Long, Long) = {
    val d = MD5.get()
    d.reset()
    val dig = d.digest(bytes)
    var hi = 0L; var lo = 0L
    var i = 0
    while (i < 8) { hi = (hi << 8) | (dig(i) & 0xffL); i += 1 }
    while (i < 16) { lo = (lo << 8) | (dig(i) & 0xffL); i += 1 }
    (hi, lo)
  }

  /** See Md5SimHash: bit votes over whitespace tokens, token hash =
    * lower 64 bits of md5(token). Empty tokens are skipped (so an
    * all-whitespace doc hashes to 0 on both engines). */
  def md5SimHash(text: UTF8String): Long = {
    val votes = new Array[Int](64)
    val s = text.toString
    var start = 0
    val len = s.length
    while (start < len) {
      while (start < len && Character.isWhitespace(s.charAt(start))) start += 1
      var end = start
      while (end < len && !Character.isWhitespace(s.charAt(end))) end += 1
      if (end > start) {
        val h = md5HalvesCached(s.substring(start, end))._2
        var bit = 0
        while (bit < 64) {
          if (((h >>> bit) & 1L) == 1L) votes(bit) += 1 else votes(bit) -= 1
          bit += 1
        }
      }
      start = end
    }
    var out = 0L
    var bit = 0
    while (bit < 64) {
      if (votes(bit) > 0) out |= (1L << bit)
      bit += 1
    }
    out
  }

  /** See Md5MinHash: slot j = min over canonical gram strings of
    * (h1 + (j+1)*h2) mod 2^63, (h1, h2) = md5 halves (h2 forced odd).
    * Values stay in [0, 2^63), so the signed-long minima here equal
    * DuckDB's unsigned HUGEINT minima. */
  def md5MinHashSignature(text: UTF8String, shingleWords: Int, numHashes: Int): ArrayData = {
    val sig = new Array[Long](numHashes)
    java.util.Arrays.fill(sig, Long.MaxValue)
    val grams = shingleStrings(text, shingleWords)
    val n = grams.numElements()
    var k = 0
    while (k < n) {
      val g = grams.getUTF8String(k)
      val (h1, h2raw) = md5HalvesCached(g.toString)
      val h2 = h2raw | 1L
      var j = 0
      while (j < numHashes) {
        // (h1 + (j+1)*h2) mod 2^63 == drop the sign bit of the wrapped sum
        val v = (h1 + (j + 1).toLong * h2) & Long.MaxValue
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      k += 1
    }
    new GenericArrayData(sig)
  }

  def rollingHash(text: UTF8String): Long = {
    val s = text.toString
    var h = 0L
    var i = 0
    while (i < s.length) {
      h = h * 1000003L + s.charAt(i)
      i += 1
    }
    h
  }

  /** Product-quantization encode: for each of `subspaces` contiguous
    * sub-vectors, the index of the L2-nearest codeword slice. The
    * squared distance accumulates left-to-right in ascending dimension
    * order (`s += x*x`) and the argmin scans codewords ascending with a
    * strict `<`, so the LOWEST index wins ties — exactly the arithmetic
    * of the unrolled struct/array_sort expression form this replaced,
    * which is what the external oracle mirrors in SQL. */
  def pqEncode(vec: ArrayData, book: ArrayData, subspaces: Int,
      floatIn: Boolean): ArrayData = {
    val dim = book.getArray(0).numElements()
    val sub = dim / subspaces
    val nT = book.numElements()
    val out = new Array[Int](subspaces)
    var j = 0
    while (j < subspaces) {
      var best = Double.PositiveInfinity
      var bestT = 0
      var t = 0
      while (t < nT) {
        val cw = book.getArray(t)
        var s = 0.0
        var i = 0
        while (i < sub) {
          val d = j * sub + i
          val x = (if (floatIn) vec.getFloat(d).toDouble else vec.getDouble(d)) -
            cw.getDouble(d)
          s += x * x
          i += 1
        }
        if (s < best) { best = s; bestT = t }
        t += 1
      }
      out(j) = bestT
      j += 1
    }
    new GenericArrayData(out)
  }
}
