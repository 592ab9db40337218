package graft.functions

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.graftshim.SparkShims

/** Column-API wrappers for graft's native expressions, plus SQL
  * registration for sessions built without `GraftExtensions`
  * (`ensureRegistered` is idempotent).
  */
object GraftFunctions {
  private def toExpr(c: Column): Expression = SparkShims.expression(c)
  private def toCol(e: Expression): Column = SparkShims.column(e)

  /** Reference UDF (TimestampToString.java:9-16) as a codegen'd expression. */
  def timestamp_to_string(c: Column): Column = toCol(TimestampToString(toExpr(c)))

  def cosine_similarity(a: Column, b: Column): Column =
    toCol(CosineSimilarity(toExpr(a), toExpr(b)))

  /** PQ codeword indices for `vec` against a literal codebook. */
  def pq_encode(vec: Column, codebook: Array[Array[Double]], subspaces: Int): Column =
    toCol(PqEncode(toExpr(vec),
      toExpr(org.apache.spark.sql.functions.typedLit(codebook.map(_.toSeq).toSeq)),
      subspaces))

  /** PQ encode against a codebook COLUMN (array<array<double>>) — the
    * per-cell residual path picks each row's cell book via element_at
    * on a constant-folded nested literal, so the compiled loop stays
    * identical and only the book reference varies per row. */
  def pq_encode_book(vec: Column, codebook: Column, subspaces: Int): Column =
    toCol(PqEncode(toExpr(vec), toExpr(codebook), subspaces))

  def simhash64(c: Column): Column = toCol(SimHash64(toExpr(c)))

  def minhash_signature(c: Column, shingleWords: Int, numHashes: Int): Column =
    toCol(MinHashSignature(toExpr(c), shingleWords, numHashes))

  def rolling_hash(c: Column): Column = toCol(RollingHash(toExpr(c)))

  def md5_simhash64(c: Column): Column = toCol(Md5SimHash(toExpr(c)))

  def md5_minhash_signature(c: Column, shingleWords: Int, numHashes: Int): Column =
    toCol(Md5MinHash(toExpr(c), shingleWords, numHashes))

  def hyperplane_lsh(vec: Column, bits: Int, table: Column): Column =
    toCol(HyperplaneLsh(toExpr(vec), toExpr(table), bits))

  def sorted_intersect_count(a: Column, b: Column): Column =
    toCol(SortedIntersectCount(toExpr(a), toExpr(b)))

  def shingle_hashes(text: Column, shingleWords: Int): Column =
    toCol(ShingleHashes(toExpr(text), shingleWords))

  def shingle_strings(text: Column, shingleWords: Int): Column =
    toCol(ShingleStrings(toExpr(text), shingleWords))

  def kmv_values(c: Column, k: Int): Column =
    toCol(KmvValues(toExpr(c), k).toAggregateExpression())

  def kmv_overlap(a: Column, b: Column, k: Int): Column =
    toCol(KmvOverlap(toExpr(a), toExpr(b), k))

  /** Theta-style set algebra over two kmv_values sketches: struct of
    * union / intersection / A-minus-B / B-minus-A estimates. */
  def kmv_set_ops(a: Column, b: Column, k: Int): Column =
    toCol(KmvSetOps(toExpr(a), toExpr(b), k))

  def minhash_merge(sig: Column): Column =
    toCol(MinHashMerge(toExpr(sig)).toAggregateExpression())

  def kmv_distinct(c: Column, k: Int): Column =
    toCol(KmvDistinct(toExpr(c), k).toAggregateExpression())

  /** Build a bloom filter over pre-hashed 64-bit keys (binary result). */
  def bloom_agg(hashed: Column, numBits: Int, numHashes: Int): Column =
    toCol(BloomAgg(toExpr(hashed), numBits, numHashes).toAggregateExpression())

  /** Probe a bloom filter with a pre-hashed 64-bit key. */
  def bloom_might_contain(bloom: Column, hashed: Column, numHashes: Int): Column =
    toCol(BloomMightContain(toExpr(bloom), toExpr(hashed), numHashes))

  /** Grouped quantile sketch: array<double>, one slot per prob. */
  def kll_quantiles(c: Column, k: Int, probs: Seq[Double]): Column =
    toCol(KllQuantiles(toExpr(c), k, probs).toAggregateExpression())

  /** Misra-Gries frequent items: top-n array<struct<item,count>>;
    * counts exact while distinct-per-group <= capacity. */
  def heavy_hitters(c: Column, capacity: Int, topN: Int): Column =
    toCol(HeavyHitters(toExpr(c), capacity, topN).toAggregateExpression())

  /** Cosine over array<double> inputs (dequantized/widened vectors). */
  def cosine_similarity_d(a: Column, b: Column): Column =
    toCol(CosineSimilarityD(toExpr(a), toExpr(b)))

  /** (name, builder) pairs — single source of truth for SQL registration. */
  private[graft] val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "timestamp_to_string" -> (es => TimestampToString(es.head)),
    "cosine_similarity" -> (es => CosineSimilarity(es(0), es(1))),
    "cosine_similarity_d" -> (es => CosineSimilarityD(es(0), es(1))),
    "simhash64" -> (es => SimHash64(es.head)),
    "minhash_signature" -> (es => MinHashSignature(es.head,
      es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])),
    "rolling_hash" -> (es => RollingHash(es.head)),
    "md5_simhash64" -> (es => Md5SimHash(es.head)),
    "md5_minhash_signature" -> (es => Md5MinHash(es.head,
      es(1).eval().asInstanceOf[Int], es(2).eval().asInstanceOf[Int])),
    "shingle_strings" -> (es => ShingleStrings(es.head,
      es(1).eval().asInstanceOf[Int])),
    "kmv_distinct" -> (es => KmvDistinct(es.head,
      es(1).eval().asInstanceOf[Int]).toAggregateExpression()),
    "kmv_values" -> (es => KmvValues(es.head,
      es(1).eval().asInstanceOf[Int]).toAggregateExpression()),
    "kmv_overlap" -> (es => KmvOverlap(es(0), es(1),
      es(2).eval().asInstanceOf[Int])),
    "kmv_set_ops" -> (es => KmvSetOps(es(0), es(1),
      es(2).eval().asInstanceOf[Int])),
    "bloom_agg" -> (es => BloomAgg(es.head, es(1).eval().asInstanceOf[Int],
      es(2).eval().asInstanceOf[Int]).toAggregateExpression()),
    "bloom_might_contain" -> (es => BloomMightContain(es(0), es(1),
      es(2).eval().asInstanceOf[Int])),
    "kll_quantiles" -> (es => KllQuantiles(es.head,
      es(1).eval().asInstanceOf[Int],
      es(2).eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        .toDoubleArray().toSeq).toAggregateExpression()),
    "heavy_hitters" -> (es => HeavyHitters(es.head,
      es(1).eval().asInstanceOf[Int],
      es(2).eval().asInstanceOf[Int]).toAggregateExpression()),
  )

  /** Register into an existing session (e.g. one built by the driver
    * without extensions). Safe to call repeatedly. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = SparkShims.functionRegistry(spark)
    builders.foreach { case (name, b) =>
      registry.createOrReplaceTempFunction(name, b, "builtin")
    }
  }
}
