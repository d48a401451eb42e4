package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** HLL sketch distinct (q75): the constant-memory COUNT DISTINCT scale
  * path. No SQL oracle exists (DuckDB's approx_distinct is a different
  * sketch), so the pins live here: error bound against the exact count,
  * determinism across runs, and partitioning-insensitivity (the register
  * merge is max-based, so the estimate cannot depend on layout).
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  private def rows(dir: String) =
    SparkEntry.queries("q75_hll_distinct")(spark, dir)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))

  test("estimate within 2% of exact for every group, at two SFs") {
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val got = rows(dir)
      assert(got.nonEmpty)
      got.foreach { case (et, approx, exact, relErr) =>
        assert(relErr < 0.02, s"$dir/$et: approx=$approx exact=$exact relErr=$relErr")
      }
    }
  }

  test("estimate is deterministic and partitioning-insensitive") {
    import org.apache.spark.sql.functions._
    val a = rows(sf)
    val b = rows(sf)
    assert(a.toSeq == b.toSeq, "re-run changed the estimate")
    // same data, radically different partitioning → same registers
    val repart = Tables.events(spark, sf).repartition(17, col("event_id"))
    val c = repart.groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)).as("approx_users"))
      .orderBy(col("event_type"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(c == a.map(t => (t._1, t._2)).toSeq, "partitioning changed the estimate")
  }

  test("q133 rollup from stored sketch bytes equals the direct ungrouped estimate") {
    import org.apache.spark.sql.functions._
    for (dir <- Seq(sf, "/root/testdata/sf0.01")) {
      val ev = Tables.events(spark, dir)
      val rolled = SparkEntry.queries("q133_hll_rollup")(spark, dir)
        .collect().head
      val direct = ev
        .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"), 12)))
        .head().getLong(0)
      // max-based register merge: grouping the store any way and
      // unioning the bytes reconstructs the direct sketch exactly
      assert(rolled.getLong(1) == direct,
        s"$dir: rollup=${rolled.getLong(1)} direct=$direct")
      val exact = ev.select(countDistinct(col("user_id"))).head().getLong(0)
      assert(math.abs(rolled.getLong(1) - exact).toDouble / exact < 0.02,
        s"$dir: rollup=${rolled.getLong(1)} exact=$exact")
    }
  }
}
