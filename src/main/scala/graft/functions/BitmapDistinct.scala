package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, LongType}
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Exact distinct-count aggregate over a RoaringBitmap buffer.
  *
  * The scale path for B10/B11: `count(DISTINCT k)` plans an extra shuffle
  * of every distinct key (Expand + re-aggregate); HLL is one pass but
  * approximate. A compressed bitmap is the middle road for integer keys —
  * one pass, exact, and partial buffers merge as tiny compressed runs
  * instead of key sets. Classic warehouse technique (Druid/ClickHouse/
  * Kylin all ship one); built here on the RoaringBitmap library Spark
  * already depends on.
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Roaring64Bitmap] {

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(b: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) b.addLong(v.asInstanceOf[Number].longValue())
    b
  }

  override def merge(b: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    b.or(other); b
  }

  override def eval(b: Roaring64Bitmap): Any = b.getLongCardinality

  override def serialize(b: Roaring64Bitmap): Array[Byte] = {
    b.runOptimize()
    val bos = new ByteArrayOutputStream()
    b.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BitmapDistinct =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(offset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "bitmap_distinct"
}
