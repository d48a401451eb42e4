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

  test("bucketed pre-binned layout: range join runs with NO exchange, and still equals the theta join") {
    import spark.implicits._
    // the binIntervals/binPoints scaladoc claim made executable (the
    // AsOfJoinSpec zero-movement pin applied to the range join): a lake
    // that materializes both bin tables bucketed by __bin serves every
    // recurring range join with zero data movement
    spark.sql("CREATE DATABASE IF NOT EXISTS rj_bkt")
    for (t <- Seq("pts", "ivs")) {
      spark.sql(s"DROP TABLE IF EXISTS rj_bkt.$t")
      val loc = new java.io.File(s"spark-warehouse/rj_bkt.db/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val bw = 16L
    val points = (0L until 300L by 2L).toDF("p")
    val intervals = (0 until 80).map { i =>
      val lo = (i * 11L) % 250L
      (lo, lo + (i % 5) * 9L, i.toLong)
    }.toDF("lo", "hi", "iv_id")
    RangeJoin.binPoints(points, "p", bw).repartition(8, $"__bin")
      .write.bucketBy(8, "__bin").saveAsTable("rj_bkt.pts")
    RangeJoin.binIntervals(intervals, "lo", "hi", bw).repartition(8, $"__bin")
      .write.bucketBy(8, "__bin").saveAsTable("rj_bkt.ivs")

    // force the co-located path: at lake scale neither side broadcasts,
    // which is exactly the regime the bucketed layout exists for
    val threshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val got = try {
      val df = RangeJoin.pointInIntervalPrebinned(
        spark.table("rj_bkt.pts"), "p", spark.table("rj_bkt.ivs"), "lo", "hi")
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.linesIterator.exists(_.contains("Exchange")),
        s"bucketed pre-binned range join must not shuffle:\n${plan.take(800)}")
      df.select($"p", $"iv_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", threshold)
    val naive = points.join(intervals, $"p" >= $"lo" && $"p" <= $"hi")
      .select($"p", $"iv_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(naive.nonEmpty && got == naive,
      s"zero-movement plan diverged: missing=${(naive -- got).take(5)} extra=${(got -- naive).take(5)}")
  }
}
