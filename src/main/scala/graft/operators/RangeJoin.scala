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
                      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    def bin(c: Column): Column = floor(c / binWidth).cast("long")
    val binned = intervals.withColumn("__bin",
      explode(sequence(bin(col(loCol)), bin(col(hiCol)))))
    points.withColumn("__bin", bin(col(pointCol)))
      .join(binned, "__bin")
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bin")
  }
}
