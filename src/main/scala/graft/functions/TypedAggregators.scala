package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed `Aggregator[IN, BUF, OUT]` examples — the user-facing typed
  * aggregation API (vs MinHashSketch's internal TypedImperativeAggregate).
  *
  * WeightedMean: numerically exact formulation (sum of products / sum of
  * weights, both accumulated as cents-scaled longs) so results are
  * bit-reproducible across engines and partitionings — the same
  * decimal-exactness discipline the SQL queries use.
  */
object TypedAggregators {

  /** Weighted mean of `value` with weight `weight`, both clean 2-decimal
    * doubles, accumulated exactly in scaled longs (cents x cents).
    */
  case class WIn(value: Double, weight: Double)
  case class WBuf(num: Long, den: Long) // value*weight in 1e-4 units; weight in cents

  object WeightedMean extends Aggregator[WIn, WBuf, Double] {
    override def zero: WBuf = WBuf(0L, 0L)
    override def reduce(b: WBuf, in: WIn): WBuf = {
      val vCents = math.round(in.value * 100)
      val wCents = math.round(in.weight * 100)
      WBuf(b.num + vCents * wCents, b.den + wCents)
    }
    override def merge(a: WBuf, b: WBuf): WBuf = WBuf(a.num + b.num, a.den + b.den)
    override def finish(b: WBuf): Double =
      if (b.den == 0) 0.0 else b.num.toDouble / 100.0 / b.den.toDouble
    override def bufferEncoder: Encoder[WBuf] = Encoders.product[WBuf]
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }
}
