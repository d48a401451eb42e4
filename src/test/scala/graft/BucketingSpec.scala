package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located (bucketed) fact-fact joins: the 100 TB technique for the
  * orders⋈lineitem shuffle. Writing both sides bucketed AND sorted by
  * the join key lets the sort-merge join read bucket-aligned files with
  * NO exchange and NO per-query sort — the shuffle is paid once at write
  * time and amortized over every subsequent join, exactly how a lake
  * would lay out its biggest fact tables.
  */
class BucketingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("bucketed+sorted fact tables sort-merge join with no exchange and no sort") {
    import spark.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS bucketed")
    spark.sql("DROP TABLE IF EXISTS bucketed.b_orders")
    spark.sql("DROP TABLE IF EXISTS bucketed.b_lineitem")
    // a previously-failed run can leave the managed location behind with
    // no catalog entry; saveAsTable then refuses the path
    for (t <- Seq("b_orders", "b_lineitem")) {
      val loc = new java.io.File(s"spark-warehouse/bucketed.db/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    // repartition by the bucket key first → exactly ONE file per bucket,
    // the layout Spark requires to trust per-bucket sort order and elide
    // the per-query Sort (multi-file buckets are only locally sorted)
    Tables.orders(spark, sf)
      .repartition(8, $"o_orderkey")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .saveAsTable("bucketed.b_orders")
    Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_quantity", $"l_extendedprice")
      .repartition(8, $"l_orderkey")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .saveAsTable("bucketed.b_lineitem")

    // force the join path under test: no broadcast fallback
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      // since 3.0 the scan only reports per-bucket sort order under this
      // flag (and only when every bucket is a single file — see the
      // repartition above); with it the SMJ needs neither exchange nor sort
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val joined = spark.table("bucketed.b_lineitem")
        .join(spark.table("bucketed.b_orders"), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan.take(800))
      // bucket alignment: the join inputs must NOT be re-shuffled or
      // re-sorted — the only exchange allowed is the one AFTER the join
      // for the groupBy
      val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSection.contains("Exchange"),
        s"bucketed join inputs must not re-shuffle:\n${joinSection.take(800)}")
      assert(!joinSection.contains("+- Sort"),
        s"bucket-sorted inputs must not re-sort:\n${joinSection.take(800)}")
      // and the result is right (same as joining the raw tables)
      val expected = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), $"l_orderkey" === $"o_orderkey")
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy($"o_orderpriority").collect().toSeq
      assert(joined.orderBy($"o_orderpriority").collect().toSeq == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
    }
  }
}
