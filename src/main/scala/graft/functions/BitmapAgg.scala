package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Shared paged-bitmap kernel for the exact-distinct aggregates and the
  * bitmap set-algebra expressions: pages of 4096 bits (64 longs, 512 B)
  * keyed by zigzag(id) >> 12 in a LongMap — memory tracks the id-space
  * actually touched, not max(id), so sparse or shifted domains don't
  * blow up. The serialized form is the exchange/sink format: 4-byte page
  * count, then (8-byte page key + 512-byte words) per page.
  *
  * The static entry points ([[andCount]], [[cardinality]]) are called
  * from generated code by the scalar expressions below, so they must
  * stay plain JVM statics with primitive-array signatures.
  */
object BitmapPages {
  type Pages = scala.collection.mutable.LongMap[Array[Long]]

  def empty: Pages = scala.collection.mutable.LongMap.empty[Array[Long]]

  def set(buf: Pages, id: Long): Unit = {
    val z = (id << 1) ^ (id >> 63) // zigzag: negatives interleave in
    val page = z >>> 12
    val bit = (z & 4095L).toInt
    val words = buf.getOrElseUpdate(page, new Array[Long](64))
    words(bit >> 6) |= (1L << (bit & 63))
  }

  def merge(a: Pages, b: Pages): Pages = {
    b.foreach { case (page, words) =>
      a.get(page) match {
        case Some(aw) =>
          var i = 0
          while (i < 64) { aw(i) |= words(i); i += 1 }
        case None => a.update(page, words)
      }
    }
    a
  }

  def count(buf: Pages): Long = {
    var n = 0L
    buf.foreach { case (_, words) =>
      var i = 0
      while (i < 64) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    n
  }

  def serialize(buf: Pages): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * (8 + 512))
    bb.putInt(buf.size)
    buf.foreach { case (page, words) =>
      bb.putLong(page)
      var i = 0
      while (i < 64) { bb.putLong(words(i)); i += 1 }
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Pages = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = empty
    var p = 0
    while (p < n) {
      val page = bb.getLong
      val words = new Array[Long](64)
      var i = 0
      while (i < 64) { words(i) = bb.getLong; i += 1 }
      buf.update(page, words)
      p += 1
    }
    buf
  }

  /** |A ∩ B| without materializing the intersection: index one side's
    * pages, stream the other's serialized form page by page, AND +
    * popcount on page hits. Linear in the bitmap sizes — never touches
    * the id level.
    */
  def andCount(a: Array[Byte], b: Array[Byte]): Long = {
    val idx = deserialize(a)
    val bb = ByteBuffer.wrap(b)
    val n = bb.getInt
    var total = 0L
    var p = 0
    while (p < n) {
      val page = bb.getLong
      idx.get(page) match {
        case Some(aw) =>
          var i = 0
          while (i < 64) {
            total += java.lang.Long.bitCount(aw(i) & bb.getLong); i += 1
          }
        case None => bb.position(bb.position() + 512)
      }
      p += 1
    }
    total
  }

  /** Popcount of a serialized bitmap — streamed, no page map built. */
  def cardinality(a: Array[Byte]): Long = {
    val bb = ByteBuffer.wrap(a)
    val n = bb.getInt
    var total = 0L
    var p = 0
    while (p < n) {
      bb.getLong // page key
      var i = 0
      while (i < 64) { total += java.lang.Long.bitCount(bb.getLong); i += 1 }
      p += 1
    }
    total
  }
}

/** Exact distinct count of an integer id column via a paged bitmap —
  * the exact counterpart of the HLL sketch (q75), the ClickHouse/Druid
  * `groupBitmap` idea on Spark's aggregation frame.
  *
  * Why not `countDistinct`: Spark plans COUNT(DISTINCT x) as an Expand +
  * two aggregations, shuffling one row per distinct (group, value) pair.
  * A bitmap buffer absorbs duplicates map-side into set bits, merges
  * associatively with bitwise OR, and ships ~1 bit per distinct id —
  * for dense integer id spaces (user ids, entity keys) that is orders of
  * magnitude less exchange at 100 TB, while staying EXACT (unlike HLL).
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapPages.Pages] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): BitmapPages.Pages = BitmapPages.empty

  override def update(buf: BitmapPages.Pages, input: InternalRow): BitmapPages.Pages = {
    val v = child.eval(input)
    if (v != null) BitmapPages.set(buf, v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: BitmapPages.Pages, b: BitmapPages.Pages): BitmapPages.Pages =
    BitmapPages.merge(a, b)

  override def eval(buf: BitmapPages.Pages): Any = BitmapPages.count(buf)

  override def serialize(buf: BitmapPages.Pages): Array[Byte] = BitmapPages.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BitmapPages.Pages = BitmapPages.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapDistinct =
    copy(child = newChildren.head)
}

object BitmapDistinct {
  /** Column API: bitmap_distinct(idCol) → bigint exact distinct count. */
  def apply(c: Column): Column =
    Bridge.column(BitmapDistinct(Bridge.expression(c)).toAggregateExpression())
}

/** The same aggregation, but emitting the serialized BITMAP itself
  * instead of its cardinality — the materialized segment-membership
  * artifact set algebra runs over (audience overlap, funnel set math,
  * incremental distinct maintenance). ~1 bit per member on the exchange
  * and in the result; pair it with [[BitmapAndCount]] /
  * [[BitmapCardinality]].
  */
case class BitmapBits(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BitmapPages.Pages] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "bitmap_bits"

  override def createAggregationBuffer(): BitmapPages.Pages = BitmapPages.empty

  override def update(buf: BitmapPages.Pages, input: InternalRow): BitmapPages.Pages = {
    val v = child.eval(input)
    if (v != null) BitmapPages.set(buf, v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: BitmapPages.Pages, b: BitmapPages.Pages): BitmapPages.Pages =
    BitmapPages.merge(a, b)

  override def eval(buf: BitmapPages.Pages): Any = BitmapPages.serialize(buf)

  override def serialize(buf: BitmapPages.Pages): Array[Byte] = BitmapPages.serialize(buf)
  override def deserialize(bytes: Array[Byte]): BitmapPages.Pages = BitmapPages.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapBits =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapBits =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): BitmapBits =
    copy(child = newChildren.head)
}

object BitmapBits {
  /** Column API: bitmap_bits(idCol) → binary serialized membership bitmap. */
  def apply(c: Column): Column =
    Bridge.column(BitmapBits(Bridge.expression(c)).toAggregateExpression())
}

/** |A ∩ B| over two serialized bitmaps — codegen'd; the static kernel
  * streams the right bitmap against the left's page index, so the cost
  * is linear in bitmap bytes and the id level is never touched.
  */
case class BitmapAndCount(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_and_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    BitmapPages.andCount(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitmapPages.andCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCount =
    copy(left = newLeft, right = newRight)
}

object BitmapAndCount {
  def apply(a: Column, b: Column): Column =
    Bridge.column(BitmapAndCount(Bridge.expression(a), Bridge.expression(b)))
}

/** Popcount of a serialized bitmap (codegen'd, streamed). */
case class BitmapCardinality(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_cardinality"

  override protected def nullSafeEval(a: Any): Any =
    BitmapPages.cardinality(a.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a => s"graft.functions.BitmapPages.cardinality($a)")

  override protected def withNewChildInternal(newChild: Expression): BitmapCardinality =
    copy(child = newChild)
}

object BitmapCardinality {
  def apply(c: Column): Column =
    Bridge.column(BitmapCardinality(Bridge.expression(c)))
}
