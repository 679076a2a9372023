package graft.ops

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, LongType}

/** Integer vector kernels for the quantized-embedding operators.
  *
  * The Column-tree forms (`aggregate(zip_with(a, b, _*_), 0L, _+_)` and
  * the squared-norm analog) are higher-order functions, which Catalyst
  * evaluates with interpreted lambdas per element — the dominant cost of
  * every ANN / embedding-dedup verify (10M pairs × 64 dims in the
  * BASELINE.md lsh_dedup stress is ~1.3B lambda invocations). These are
  * straight-line long loops behind `defineCodeGen`, so the dot product
  * inlines into whole-stage codegen like any built-in.
  *
  * Semantics match the zip_with form on equal-length inputs (all graft
  * embeddings are fixed 64-dim); on ragged inputs the shorter length
  * bounds the loop.
  */
object VecKernel {
  def dot(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var s = 0L
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  def sqNorm(a: ArrayData): Long = {
    val n = a.numElements()
    var i = 0
    var s = 0L
    while (i < n) { val v = a.getLong(i); s += v * v; i += 1 }
    s
  }
}

case class DotLong(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(a: Any, b: Any): Any =
    VecKernel.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.VecKernel.dot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): DotLong =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "dot_q"
}

case class SqNormLong(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullSafeEval(input: Any): Any =
    VecKernel.sqNorm(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.VecKernel.sqNorm($c)")
  override protected def withNewChildInternal(newChild: Expression): SqNormLong =
    copy(child = newChild)
  override def prettyName: String = "sqnorm_q"
}
