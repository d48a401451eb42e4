package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import graft.operators.KllSketch

/** Shared input-type guards for the KLL aggregate family. */
private[functions] object KllAggChecks {
  /** The sketch holds Longs and `update` folds values in via
    * `Number.longValue`, which would silently TRUNCATE fractional
    * doubles — so the documented cast-upstream-to-Long contract is
    * enforced at analysis time: only integral children are accepted
    * (scaled integers keep the engine's exact-arithmetic discipline).
    */
  def integralChild(name: String, t: DataType): TypeCheckResult = t match {
    case ByteType | ShortType | IntegerType | LongType =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$name requires an integral child (cast upstream to LONG — e.g. " +
        s"(value * 100).cast('long') for scaled decimals); got ${other.sql}")
  }

  /** Duplicate permilles would emit duplicate `q_<p>` struct fields,
    * making `qs.q_<p>` references ambiguous at RUNTIME — fail at
    * construction instead.
    */
  def validPermilles(permilles: Seq[Int]): Unit = {
    require(permilles.nonEmpty && permilles.forall(p => p >= 1 && p <= 1000),
      s"permilles must be in [1, 1000]: $permilles")
    require(permilles.distinct.size == permilles.size,
      s"permilles must be distinct (duplicates would emit duplicate q_<p> fields): $permilles")
  }
}

/** Grouped KLL quantiles as ONE typed-imperative aggregate: each group's
  * rows stream into a KllSketch buffer, partial aggregation works as
  * usual, and the SHUFFLE CARRIES SKETCHES, NOT ROWS — at 100 TB a
  * per-group quantile needs one map-side-combined pass instead of
  * co-locating any group (the exact path, [[graft.operators.Percentiles]],
  * exists for when exactness is required; `Kll.sketch` covers the
  * ungrouped driver-merge path).
  *
  * Output struct per group: (n, err_bound, q_<permille>…). Merge order
  * inside Spark's aggregation is partitioning-dependent and KLL merge is
  * deterministic but not order-invariant, so estimates (and the bound)
  * may vary run to run — the CERTIFIED invariant that holds under EVERY
  * merge order is |estimate − true rank| ≤ err_bound, which is exactly
  * what the emitted bound lets a consumer (and KllSpec/StreamingSpec)
  * check. This is why the sketch carries its own proof instead of
  * relying on replayable layout.
  */
case class KllAgg(
    child: Expression,
    k: Int,
    permilles: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] {

  KllAggChecks.validPermilles(permilles)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_quantiles"
  override def checkInputDataTypes(): TypeCheckResult =
    KllAggChecks.integralChild(prettyName, child.dataType)

  override def dataType: DataType = StructType(
    StructField("n", LongType, nullable = false) +:
    StructField("err_bound", LongType, nullable = false) +:
    permilles.map(p => StructField(s"q_$p", LongType, nullable = false)))

  override def createAggregationBuffer(): KllSketch = KllSketch.empty(k)

  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    // Number.longValue, not asInstanceOf[Long]: an integer-typed child
    // (e.g. length()) must aggregate, not ClassCastException per row —
    // same defensive widening as BitmapAgg in this package
    if (v != null) buf.update(v.asInstanceOf[Number].longValue())
    buf
  }

  override def merge(a: KllSketch, b: KllSketch): KllSketch = a.merge(b)

  override def eval(buf: KllSketch): Any =
    if (buf.count == 0) null // all-null group: no quantiles to report
    else new GenericInternalRow(
      (buf.count +: buf.errBound +: permilles.map(p => buf.quantile(p))).toArray[Any])

  override def serialize(buf: KllSketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllAgg =
    copy(child = newChildren.head)
}

object KllAgg {
  /** Column API: kll_quantiles(longCol) → struct(n, err_bound, q_<p>…).
    * The child must be LongType (cast upstream — quantiles of scaled
    * integers keep the engine's exact-arithmetic discipline).
    */
  def apply(c: Column, k: Int, permilles: Seq[Int]): Column =
    Bridge.column(KllAgg(Bridge.expression(c), k, permilles)
      .toAggregateExpression())
}

/** The SKETCH-STORE half of the KLL family: aggregate values into a
  * sketch and emit its BYTES — a sketch-as-data column a table can
  * persist next to its group keys. Together with [[KllMergeAgg]] this is
  * the stored-partial-aggregate pattern for quantiles: pre-aggregate
  * once per fine key (per day, per shard, per language), keep only the
  * constant-size sketch bytes, and answer any coarser rollup later
  * WITHOUT the raw data — the sketch analog of q85's algebraic-monoid
  * incremental aggregates, for a statistic no monoid of scalars can
  * carry.
  */
case class KllSketchBytesAgg(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "kll_sketch_bytes"
  override def checkInputDataTypes(): TypeCheckResult =
    KllAggChecks.integralChild(prettyName, child.dataType)

  override def createAggregationBuffer(): KllSketch = KllSketch.empty(k)
  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Number].longValue())
    buf
  }
  override def merge(a: KllSketch, b: KllSketch): KllSketch = a.merge(b)
  override def eval(buf: KllSketch): Any = buf.toBytes
  override def serialize(buf: KllSketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchBytesAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchBytesAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllSketchBytesAgg =
    copy(child = newChildren.head)
}

object KllSketchBytesAgg {
  def apply(c: Column, k: Int): Column =
    Bridge.column(KllSketchBytesAgg(Bridge.expression(c), k).toAggregateExpression())
}

/** Rollup over STORED sketches: merges a BINARY sketch column (the
  * [[KllSketchBytesAgg]] output) and reports quantiles from the merged
  * sketch — the read side of the sketch store. All sketches must share
  * `k` (fromBytes carries it; merge enforces equality). The certified
  * bound composes: the merged `err_bound` covers every estimate over
  * the UNION of the original streams, no matter how the stored rows
  * were grouped or in which order they merge.
  */
case class KllMergeAgg(
    child: Expression,
    k: Int,
    permilles: Seq[Int],
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KllSketch] {

  KllAggChecks.validPermilles(permilles)

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = true
  override def prettyName: String = "kll_merge"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName merges stored sketch BYTES (the kll_sketch_bytes output); got ${other.sql}")
  }

  override def dataType: DataType = StructType(
    StructField("n", LongType, nullable = false) +:
    StructField("err_bound", LongType, nullable = false) +:
    permilles.map(p => StructField(s"q_$p", LongType, nullable = false)))

  override def createAggregationBuffer(): KllSketch = KllSketch.empty(k)
  override def update(buf: KllSketch, input: InternalRow): KllSketch = {
    val v = child.eval(input)
    if (v != null) buf.merge(KllSketch.fromBytes(v.asInstanceOf[Array[Byte]]))
    buf
  }
  override def merge(a: KllSketch, b: KllSketch): KllSketch = a.merge(b)
  override def eval(buf: KllSketch): Any =
    if (buf.count == 0) null
    else new GenericInternalRow(
      (buf.count +: buf.errBound +: permilles.map(p => buf.quantile(p))).toArray[Any])
  override def serialize(buf: KllSketch): Array[Byte] = buf.toBytes
  override def deserialize(bytes: Array[Byte]): KllSketch = KllSketch.fromBytes(bytes)
  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

object KllMergeAgg {
  def apply(c: Column, k: Int, permilles: Seq[Int]): Column =
    Bridge.column(KllMergeAgg(Bridge.expression(c), k, permilles).toAggregateExpression())
}
