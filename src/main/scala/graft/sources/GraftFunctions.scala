package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BoundReference, Murmur3Hash}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, LongType, ShortType, StringType, StructType}

/** The catalog's `bucket(n, col)` function — the identity Spark's
  * storage-partitioned-join machinery matches across two bucketed
  * tables: `V2ExpressionUtils` resolves each side's reported
  * `bucket(n, col)` transform through its catalog's FunctionCatalog and
  * the join is exchange-free only when both bound functions agree
  * (`canonicalName` + bucket count). The bound semantics MUST equal the
  * write path's bucket assignment (`pmod(hash(col), n)` — catalyst
  * Murmur3, seed 42) or grouped execution would co-locate rows the
  * writer scattered; `produceResult` evaluates exactly that expression.
  *
  * `canonicalName` encodes the SOURCE TYPE because catalyst's Murmur3
  * hashes int 5 and bigint 5 differently — two tables bucketed on
  * differently-typed keys are NOT co-partitioned, and the distinct names
  * make Spark refuse the pairing instead of mis-joining. The same
  * argument is why ALTER COLUMN TYPE refuses on a bucket column.
  */
private[sources] object GraftBucketFunction extends UnboundFunction {
  /** Bucket-source types the layer accepts: hash semantics pinned and
    * key rows renderable. Extend deliberately, never implicitly.
    */
  def supportedSource(dt: DataType): Boolean = dt match {
    case LongType | IntegerType | ShortType | ByteType | StringType => true
    case _ => false
  }

  override def name(): String = "bucket"
  override def description(): String =
    "bucket(n, col): pmod(murmur3(col), n) — the value-pure bucket id"

  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2,
      s"bucket takes (numBuckets INT, value); got ${inputType.simpleString}")
    require(inputType.fields(0).dataType == IntegerType,
      s"bucket's first argument is the INT bucket count; got " +
        inputType.fields(0).dataType.simpleString)
    val src = inputType.fields(1).dataType
    require(supportedSource(src),
      s"bucket source type ${src.simpleString} is not supported " +
        "(integral or string only: hash semantics must stay pinned)")
    new GraftBucketBound(src)
  }
}

private[sources] final class GraftBucketBound(src: DataType)
    extends ScalarFunction[Integer] {
  override def inputTypes(): Array[DataType] = Array(IntegerType, src)
  override def resultType(): DataType = IntegerType
  override def name(): String = "bucket"
  override def canonicalName(): String = s"graft.bucket(${src.catalogString})"
  override def isResultNullable: Boolean = false

  // the exact write-path expression over this row's second field —
  // hash(null) = seed, so null keys bucket deterministically too
  @transient private lazy val hashExpr =
    new Murmur3Hash(Seq(BoundReference(1, src, nullable = true)))

  override def produceResult(input: InternalRow): Integer = {
    val n = input.getInt(0)
    val h = hashExpr.eval(input).asInstanceOf[Int]
    ((h % n) + n) % n
  }
}

private[sources] object GraftBucketFunctionHelpers {
  /** Driver-side bucket ids of a batch of INTERNAL values (runtime-
    * filter translation): identical to the write path and to
    * [[GraftBucketBound.produceResult]]. One bound expression serves
    * the whole batch — a dynamic-pruning IN-set can carry millions of
    * keys, so per-value expression construction would be the cost.
    */
  def bucketIdsOf(vs: Seq[Any], dt: DataType, n: Int): Set[Int] = {
    val expr = new Murmur3Hash(Seq(BoundReference(0, dt, nullable = true)))
    val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
    vs.iterator.map { v =>
      row.update(0, v)
      val h = expr.eval(row).asInstanceOf[Int]
      ((h % n) + n) % n
    }.toSet
  }

  /** Single-value form (write-path parity checks in specs). */
  def bucketIdOf(v: Any, dt: DataType, n: Int): Int =
    bucketIdsOf(Seq(v), dt, n).head
}
