package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

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
  *
  * Buffer: pages of 4096 bits (64 longs, 512 B) keyed by id >> 12 in a
  * LongMap — memory tracks the id-space actually touched, not max(id),
  * so sparse or shifted domains don't blow up. Ids may be negative:
  * zigzag-encoded first. Cardinality = Σ bitCount, evaluated once at
  * finish.
  */
case class BitmapDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[scala.collection.mutable.LongMap[Array[Long]]] {

  type Pages = scala.collection.mutable.LongMap[Array[Long]]

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_distinct"

  override def createAggregationBuffer(): Pages =
    scala.collection.mutable.LongMap.empty[Array[Long]]

  private def set(buf: Pages, id: Long): Unit = {
    val z = (id << 1) ^ (id >> 63) // zigzag: negatives interleave in
    val page = z >>> 12
    val bit = (z & 4095L).toInt
    val words = buf.getOrElseUpdate(page, new Array[Long](64))
    words(bit >> 6) |= (1L << (bit & 63))
  }

  override def update(buf: Pages, input: InternalRow): Pages = {
    val v = child.eval(input)
    if (v != null) set(buf, v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: Pages, b: Pages): Pages = {
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

  override def eval(buf: Pages): Any = {
    var n = 0L
    buf.foreach { case (_, words) =>
      var i = 0
      while (i < 64) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    n
  }

  override def serialize(buf: Pages): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * (8 + 512))
    bb.putInt(buf.size)
    buf.foreach { case (page, words) =>
      bb.putLong(page)
      var i = 0
      while (i < 64) { bb.putLong(words(i)); i += 1 }
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Pages = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
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
