package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Layout

/** Data-layout invariants for the lake write path: range-partitioned
  * sorted parquet must come out as pairwise-disjoint per-file key ranges
  * (the property row-group/file pruning exploits at 100 TB), and Spark's
  * runtime bloom-filter join pruning must actually inject on a selective
  * shuffle join — both asserted on executed plans/data, not comments.
  */
class LayoutSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("writeSorted: per-file ranges are pairwise disjoint and data is preserved") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/li"
    val li = Tables.lineitem(spark, sf)
    Layout.writeSorted(li, dir, "l_shipdate", 8)
    val ranges = Layout.fileRanges(spark, dir, "l_shipdate")
      .selectExpr("file", "CAST(lo AS STRING)", "CAST(hi AS STRING)")
      .collect().map(r => (r.getString(1), r.getString(2)))
      .sorted
    assert(ranges.length == 8, s"expected 8 files, got ${ranges.length}")
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) =>
        assert(hiA <= loB, s"file ranges overlap: hi=$hiA > next lo=$loB")
      case _ =>
    }
    // nothing lost or duplicated in the rewrite
    val back = spark.read.parquet(dir)
    assert(back.count() == li.count())
    assert(back.agg(sum("l_quantity")).head.getDouble(0) ==
      li.agg(sum("l_quantity")).head.getDouble(0))
  }

  test("a narrow predicate on the sort key intersects ~1 of N disjoint file ranges") {
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/li"
    Layout.writeSorted(Tables.lineitem(spark, sf), dir, "l_orderkey", 8)
    val ranges = Layout.fileRanges(spark, dir, "l_orderkey")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val probe = ranges.head._1 // a key that exists
    val touched = ranges.count { case (lo, hi) => lo <= probe && probe <= hi }
    assert(touched == 1,
      s"point predicate should be servable from exactly 1 file's range, hit $touched")
    // and the predicate reaches the scan, so footer stats can prune
    val p = spark.read.parquet(dir).filter(col("l_orderkey") === probe)
      .queryExecution.executedPlan.toString
    assert(p.contains("PushedFilters: [IsNotNull(l_orderkey), EqualTo(l_orderkey"), p.take(500))
  }

  test("runtime bloom filter injects on the big side of a selective shuffle join") {
    val confs = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")
    val prev = confs.map { case (k, _) => k -> spark.conf.get(k) }
    try {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val orders = Tables.orders(spark, sf).filter(col("o_orderpriority") === "1-URGENT")
      val joined = Tables.lineitem(spark, sf)
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("o_orderpriority"))
      assert(joined.collect().nonEmpty)
      val p = joined.queryExecution.executedPlan.toString.toLowerCase
      assert(p.contains("might_contain") || p.contains("bloomfilter"),
        s"expected an injected bloom-filter runtime filter on the lineitem side:\n${p.take(1500)}")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
  }
}
