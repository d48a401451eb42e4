package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Percentiles

/** The distributed rank-selection percentile must equal Spark's built-in
  * exact `percentile` aggregate bit-for-bit — on real data, tie-heavy
  * columns, edge probabilities, and tiny groups — while never building a
  * per-group value map (the built-in's executor-memory bomb at 100 TB).
  */
class PercentilesSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.01"

  private def builtin(df: org.apache.spark.sql.DataFrame, group: String,
                      specs: Seq[(String, Double, String)]) =
    df.groupBy(col(group)).agg(
      expr(s"percentile(${specs.head._1}, ${specs.head._2})").as(specs.head._3),
      specs.drop(1).map { case (v, p, o) => expr(s"percentile($v, $p)").as(o) }: _*)

  private def assertEqual(df: org.apache.spark.sql.DataFrame, group: String,
                          specs: Seq[(String, Double, String)], buckets: Int = 0): Unit = {
    val cols = group +: specs.map(_._3)
    val got = Percentiles.exactInterpolated(df, group, specs, buckets)
      .select(cols.map(col): _*).orderBy(col(group)).collect().toSeq
    val exp = builtin(df, group, specs)
      .select(cols.map(col): _*).orderBy(col(group)).collect().toSeq
    assert(got == exp)
  }

  test("matches builtin percentile on lineitem: ties (quantity) and near-unique (price)") {
    assertEqual(Tables.lineitem(spark, sf), "l_returnflag", Seq(
      ("l_quantity", 0.5, "p50_qty"),
      ("l_extendedprice", 0.25, "p25_price"),
      ("l_extendedprice", 0.95, "p95_price")))
  }

  test("edge probabilities p=0 and p=1 hit group min/max exactly") {
    val li = Tables.lineitem(spark, sf)
    assertEqual(li, "l_returnflag", Seq(
      ("l_extendedprice", 0.0, "pmin"), ("l_extendedprice", 1.0, "pmax")))
    val got = Percentiles.exactInterpolated(li, "l_returnflag",
      Seq(("l_extendedprice", 0.0, "pmin"), ("l_extendedprice", 1.0, "pmax")))
    val mm = li.groupBy("l_returnflag")
      .agg(min("l_extendedprice").as("pmin"), max("l_extendedprice").as("pmax"))
    assert(got.orderBy("l_returnflag").collect().toSeq ==
      mm.orderBy("l_returnflag").collect().toSeq)
  }

  test("tiny groups (n=1, n=2) and single-bucket degenerate config") {
    import spark.implicits._
    val df = Seq(("a", 10.0), ("b", 1.0), ("b", 2.0), ("c", 5.0), ("c", 6.0), ("c", 7.0))
      .toDF("g", "v")
    assertEqual(df, "g", Seq(("v", 0.5, "p50"), ("v", 0.9, "p90")))
    assertEqual(df, "g", Seq(("v", 0.5, "p50")), buckets = 1)
  }

  test("nulls in the value column are ignored like the builtin's") {
    import spark.implicits._
    // scattered nulls: every group keeps ≥1 non-null value, so output
    // groups align with the builtin (all-null groups are documented as
    // omitted rather than emitted null)
    val df = Seq(("a", Some(10.0)), ("a", None), ("a", Some(20.0)),
      ("b", None), ("b", Some(1.0)), ("c", Some(5.0)), ("c", Some(6.0)), ("c", None))
      .toDF("g", "v")
    assertEqual(df, "g", Seq(("v", 0.5, "p50"), ("v", 0.9, "p90")))
  }

  test("all-null group is omitted (documented divergence from the builtin's null row)") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(3.0)), ("z", None), ("z", None)).toDF("g", "v")
    val got = Percentiles.exactInterpolated(df, "g", Seq(("v", 0.5, "p50")))
      .orderBy("g").collect().toSeq
    assert(got.map(_.getString(0)) == Seq("a"))
    assert(got.head.getDouble(1) == 2.0)
  }

  test("envelope literal bounds == builtin, even under a WRONG envelope") {
    val li = Tables.lineitem(spark, sf)
    val specs = Seq(
      ("l_quantity", 0.5, "p50_qty"),
      ("l_extendedprice", 0.25, "p25_price"),
      ("l_extendedprice", 0.95, "p95_price"))
    val cols = "l_returnflag" +: specs.map(_._3)
    val exp = builtin(li, "l_returnflag", specs)
      .select(cols.map(col): _*).orderBy(col("l_returnflag")).collect().toSeq
    // the generator-law envelope (the q35/q88 call shape)
    val good = Percentiles.exactInterpolated(li, "l_returnflag", specs,
        envelope = Map("l_quantity" -> (1.0, 50.0),
          "l_extendedprice" -> (900.0, 105000.0)))
      .select(cols.map(col): _*).orderBy(col("l_returnflag")).collect().toSeq
    assert(good == exp)
    // a deliberately WRONG envelope: bounds only bucket, so out-of-range
    // values land in the edge buckets and the rank selection stays exact
    val bad = Percentiles.exactInterpolated(li, "l_returnflag", specs,
        envelope = Map("l_quantity" -> (20.0, 25.0),
          "l_extendedprice" -> (-5.0, 10.0)))
      .select(cols.map(col): _*).orderBy(col("l_returnflag")).collect().toSeq
    assert(bad == exp)
  }

  test("plan has no single-task group window: ranks partition by (group, bucket)") {
    val df = Percentiles.exactInterpolated(Tables.lineitem(spark, sf), "l_returnflag",
      Seq(("l_extendedprice", 0.5, "p50")))
    df.collect()
    val plan = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    val windows = plan.linesIterator.filter(_.contains("Window")).mkString("\n")
    // the per-row ranking window must include the bucket key; only the
    // tiny per-(group,bucket) offsets window may partition by group alone
    assert(windows.contains("__bkt"), s"expected bucketed rank window:\n$windows")
  }
}
