package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.roaringbitmap.longlong.Roaring64Bitmap

/** Serialization of the POSITION-TOMBSTONE bitmaps: one Roaring64 of
  * row ordinals per named data file — the compressed form of the open
  * formats' position-delete pairs. A 10M-ordinal purge stored as
  * row-per-ordinal parquet costs ~40 MB and a 10M-row anti-join per
  * read; as a run-optimized roaring bitmap it is a few hundred KB and
  * the read-side probe is one `contains` per row. Same wire format as
  * [[BitmapBuild]] (Roaring64 portable), so the B16 kernel and the
  * tombstones share one codec.
  */
object PosBitmaps {
  def serialize(b: Roaring64Bitmap): Array[Byte] = {
    b.runOptimize()
    val bos = new ByteArrayOutputStream()
    b.serialize(new DataOutputStream(bos))
    bos.toByteArray
  }

  def deserialize(bytes: Array[Byte]): Roaring64Bitmap = {
    val bm = new Roaring64Bitmap()
    bm.deserialize(new DataInputStream(new ByteArrayInputStream(bytes)))
    bm
  }

  def union(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    val bm = deserialize(a)
    bm.or(deserialize(b))
    serialize(bm)
  }
}

/** OR-aggregate over SERIALIZED Roaring64 bitmaps — the executor-side
  * merge of per-file position tombstones: when several delete files
  * name the same data file, their ordinal bitmaps union in the
  * executors (shuffle keyed by named file) and the driver receives only
  * the FINAL merged bytes. The driver-side fold is fine to ~100M
  * ordinals; above the manifest-proven threshold this is what keeps the
  * driver at O(final bitmap bytes) instead of O(sum of inputs) — the
  * buildBlooms sidecar shape applied to tombstones.
  */
case class BitmapOr(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends org.apache.spark.sql.catalyst.expressions.aggregate
    .TypedImperativeAggregate[Roaring64Bitmap] {

  override def createAggregationBuffer(): Roaring64Bitmap = new Roaring64Bitmap()

  override def update(b: Roaring64Bitmap, input: InternalRow): Roaring64Bitmap = {
    val v = child.eval(input)
    if (v != null) b.or(PosBitmaps.deserialize(v.asInstanceOf[Array[Byte]]))
    b
  }

  override def merge(b: Roaring64Bitmap, other: Roaring64Bitmap): Roaring64Bitmap = {
    b.or(other); b
  }

  override def eval(b: Roaring64Bitmap): Any = PosBitmaps.serialize(b)

  override def serialize(b: Roaring64Bitmap): Array[Byte] = PosBitmaps.serialize(b)

  override def deserialize(bytes: Array[Byte]): Roaring64Bitmap =
    PosBitmaps.deserialize(bytes)

  override def dataType: DataType = org.apache.spark.sql.types.BinaryType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(c: IndexedSeq[Expression]): BitmapOr =
    copy(child = c.head)
  override def withNewMutableAggBufferOffset(offset: Int): BitmapOr =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): BitmapOr =
    copy(inputAggBufferOffset = offset)
  override def prettyName: String = "bitmap_or"
}

/** Is row (`file`, `pos`) position-deleted? The per-file ordinal
  * bitmaps ride a BROADCAST (serialized bytes — deserialized ONCE per
  * executor into the transient map below, never per row), so the
  * merged read's delete probe is a scalar filter on the hot legs
  * instead of a 10M-row anti-join: zero extra shuffle, zero build-side
  * hashing, O(1) per row. Deterministic; CodegenFallback (one virtual
  * call per row on the named-file legs only — unnamed files never
  * carry the filter).
  */
case class PosDeleted(
    file: Expression,
    pos: Expression,
    bitmaps: Broadcast[Map[String, Array[Byte]]])
  extends Expression with CodegenFallback {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(file, pos)

  @transient private lazy val decoded: Map[String, Roaring64Bitmap] =
    bitmaps.value.map { case (f, b) => f -> PosBitmaps.deserialize(b) }

  override def eval(input: InternalRow): Any = {
    val f = file.eval(input)
    val p = pos.eval(input)
    if (f == null || p == null) false
    else decoded.get(f.toString) match {
      case Some(bm) => bm.contains(p.asInstanceOf[Number].longValue())
      case None     => false
    }
  }

  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): PosDeleted =
    copy(file = c(0), pos = c(1))

  override def prettyName: String = "pos_deleted"
}
