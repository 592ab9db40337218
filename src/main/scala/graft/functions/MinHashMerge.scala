package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** Aggregate that merges MinHash signatures by element-wise minimum —
  * the signature of a UNION of shingle sets is the slot-wise min of
  * the members' signatures, so a group's merged signature estimates
  * the group's distinct-shingle set. Declarative (pure expressions,
  * mergeable partial aggregation), so map-side combine works and a
  * 100 TB corpus reduces to one small signature per group before the
  * shuffle.
  *
  * Use with MinHashSignature: per-doc sigs -> groupBy(shard/group) ->
  * minhash_merge -> pairwise slot-agreement = Jaccard estimate of
  * cross-group content overlap (Dedup.corpusOverlap).
  */
case class MinHashMerge(child: Expression)
    extends DeclarativeAggregate with UnaryLike[Expression] {
  override def dataType: DataType = child.dataType
  override def nullable: Boolean = true

  private lazy val buf = AttributeReference("minhash_buf", child.dataType)()
  override lazy val aggBufferAttributes: Seq[AttributeReference] = Seq(buf)
  override lazy val initialValues: Seq[Expression] =
    Seq(Literal.create(null, child.dataType))

  private def slotMin(a: Expression, b: Expression): Expression = {
    val elemType = child.dataType.asInstanceOf[ArrayType].elementType
    val x = NamedLambdaVariable("x", elemType, nullable = false)
    val y = NamedLambdaVariable("y", elemType, nullable = false)
    ZipWith(a, b, LambdaFunction(Least(Seq(x, y)), Seq(x, y)))
  }

  override lazy val updateExpressions: Seq[Expression] = Seq(
    If(IsNull(child), buf, If(IsNull(buf), child, slotMin(buf, child))))
  override lazy val mergeExpressions: Seq[Expression] = Seq(
    If(IsNull(buf.right), buf.left,
      If(IsNull(buf.left), buf.right, slotMin(buf.left, buf.right))))
  override lazy val evaluateExpression: Expression = buf

  override protected def withNewChildInternal(c: Expression): MinHashMerge =
    copy(child = c)
  override def prettyName: String = "minhash_merge"
}
