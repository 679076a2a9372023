package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Single-pass 64-permutation minhash signature kernel.
  *
  * The Column-composition alternative (64 × `array_min(transform(...))`)
  * materializes 64 intermediate arrays per row; this kernel computes all
  * permutation minima in one traversal of the shingle-hash array —
  * measured ~4× faster on the dedup_minhash bench query — and stays
  * inside whole-stage codegen via a static-call defineCodeGen.
  */
object MinhashKernel {
  val P: Long = Dedup.MinhashP
  private val as: Array[Long] = Dedup.permParams(Dedup.NumPerms).map(_._1).toArray
  private val bs: Array[Long] = Dedup.permParams(Dedup.NumPerms).map(_._2).toArray

  def sig(arr: ArrayData): ArrayData = {
    val k = as.length
    val out = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = arr.getLong(i)
      var j = 0
      while (j < k) {
        val h = (as(j) * x + bs(j)) % P
        if (h < out(j)) out(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class MinhashSig(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    MinhashKernel.sig(input.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.MinhashKernel.sig($c)")
  override protected def withNewChildInternal(newChild: Expression): MinhashSig =
    copy(child = newChild)
  override def prettyName: String = "minhash_sig"
}
