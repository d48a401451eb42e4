package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed point-in-interval (range) join.
  *
  * Spark has no native range-join operator: a bare
  * `p.x BETWEEN i.lo AND i.hi` join has no equality conjunct, so it plans
  * as BroadcastNestedLoopJoin — every point probed against every interval,
  * O(|P|·|I|) work that no cluster size rescues at 100 TB.
  *
  * This operator makes containment an EQUI-join: intervals are exploded to
  * the fixed-width bins they overlap, points map to exactly ONE bin, the
  * join hashes on the bin id, and the exact predicate filters inside each
  * bin's candidate set. Work per point is proportional to the intervals
  * overlapping its bin only; interval replication is
  * ceil((hi-lo)/binWidth)+1 rows, so pick `binWidth` near the typical
  * interval length (replication ~2× while candidate lists stay local).
  * Skewed bins are ordinary join skew — AQE's skew-join splitting applies.
  */
object RangeJoin {

  /** Join `points` (scalar column `pointCol`) to `intervals`
    * ([loCol, hiCol], inclusive both ends). Long-typed domains (day
    * numbers, epoch micros, integer keys).
    */
  def pointInInterval(points: DataFrame, pointCol: String,
                      intervals: DataFrame, loCol: String, hiCol: String,
                      binWidth: Long): DataFrame =
    pointInIntervalPrebinned(
      binPoints(points, pointCol, binWidth),
      pointCol,
      binIntervals(intervals, loCol, hiCol, binWidth),
      loCol, hiCol)
      .drop("__bin")

  /** The interval side of the bin materialization: one row per
    * (interval, overlapped bin), `__bin` appended. A lake that stores
    * THIS table bucketed by `__bin` (and the points likewise) turns
    * every subsequent range join into a zero-shuffle co-located join —
    * the binning cost is paid once at write time, not per query
    * (RangeJoinSpec pins the no-Exchange plan on a pre-bucketed pair).
    */
  def binIntervals(intervals: DataFrame, loCol: String, hiCol: String,
                   binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol), binWidth), bin(col(hiCol), binWidth))))
  }

  /** The point side: `__bin` appended (each point maps to exactly one). */
  def binPoints(points: DataFrame, pointCol: String, binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    points.withColumn("__bin", bin(col(pointCol), binWidth))
  }

  private def bin(c: Column, binWidth: Long): Column =
    floor(c / binWidth).cast("long")

  /** Range join over PRE-BINNED inputs (both sides already carry
    * `__bin` — [[binPoints]]/[[binIntervals]] output, typically read
    * back from bucketed-by-`__bin` tables): a plain equi-join on the
    * bin plus the exact containment filter. When both tables are
    * bucketed by `__bin` with equal bucket counts, EnsureRequirements
    * elides BOTH exchanges — at 100 TB the recurring range join against
    * a slowly-changing interval dimension (IP→geo, time→tariff) runs
    * with zero data movement, the same layout amortization the as-of
    * join's bucketed pin models. Keeps `__bin` so callers can chain.
    */
  def pointInIntervalPrebinned(points: DataFrame, pointCol: String,
                               intervals: DataFrame, loCol: String,
                               hiCol: String): DataFrame =
    points.join(intervals, "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
}
