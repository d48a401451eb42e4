package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.RangeJoin

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  import scala.language.implicitConversions

  test("binned join equals the naive theta join, at several bin widths") {
    import spark.implicits._
    // deterministic coverage: boundary hits (p == lo, p == hi), multi-bin
    // spans, empty bins, intervals of length 0
    val points = (0L until 200L by 3L).toDF("p")
    val intervals = (0 until 60).map { i =>
      val lo = (i * 7L) % 150L
      (lo, lo + (i % 4) * 11L, i.toLong)
    }.toDF("lo", "hi", "iv_id")

    val naive = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"p", $"iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty)
    for (bw <- Seq(1L, 5L, 11L, 64L)) {
      val got = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", bw)
        .select($"p", $"iv_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      assert(got.toSet == naive, s"binWidth=$bw diverges from the theta join")
      // a multi-bin interval must match each contained point exactly ONCE:
      // the point lives in one bin, so no (p, interval) pair can double-join
      assert(got.length == got.toSet.size, s"binWidth=$bw produced duplicate pairs")
    }
  }

  test("the plan is a hash join on the bin id — no nested loop, no cartesian") {
    import spark.implicits._
    val points = (0L until 100L).toDF("p")
    val intervals = Seq((10L, 40L), (35L, 90L)).toDF("lo", "hi")
    val p = RangeJoin.pointInInterval(points, "p", intervals, "lo", "hi", 16L)
      .queryExecution.executedPlan.toString
    assert(!p.contains("BroadcastNestedLoopJoin") && !p.contains("CartesianProduct"), p.take(600))
    assert(p.contains("Join"), p.take(600))
  }
}
