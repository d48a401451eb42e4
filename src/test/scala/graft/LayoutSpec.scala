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

  test("compact: many small files become few sorted files; data survives; ranges disjoint") {
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/frag"
    val li = Tables.lineitem(spark, sf)
    // simulate a year of incremental appends: 64 unsorted fragments
    li.repartition(64).write.parquet(dir)
    val before = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(before >= 32, s"fixture not fragmented enough: $before files")
    val (cnt, qty) = (li.count(),
      li.agg(org.apache.spark.sql.functions.sum("l_quantity")).head.getDouble(0))

    Layout.compact(spark, dir, "l_shipdate", 4)

    val after = new java.io.File(dir).listFiles().count(_.getName.endsWith(".parquet"))
    assert(after == 4, s"expected 4 compacted files, got $after")
    val back = spark.read.parquet(dir)
    assert(back.count() == cnt)
    assert(back.agg(org.apache.spark.sql.functions.sum("l_quantity")).head.getDouble(0) == qty)
    // compaction restores the pruning invariant, not just the file budget
    val ranges = Layout.fileRanges(spark, dir, "l_shipdate")
      .selectExpr("CAST(lo AS STRING)", "CAST(hi AS STRING)")
      .collect().map(r => (r.getString(0), r.getString(1))).sorted
    ranges.sliding(2).foreach {
      case Array((_, hiA), (loB, _)) => assert(hiA <= loB, "compacted ranges overlap")
      case _ =>
    }
    // tmp/old staging dirs are gone after the atomic swap
    val parent = new java.io.File(dir).getParentFile.listFiles().map(_.getName)
    assert(!parent.exists(_.contains("compact-tmp")) && !parent.exists(_.contains("compact-old")),
      s"staging dirs leaked: ${parent.mkString(",")}")
  }

  test("compact fails fast on staging leftovers from a crashed run; the table is untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("layout").toString + "/tbl"
    val df = (1L to 100L).map(i => (i, s"r$i")).toDF("k", "s")
    df.write.parquet(dir)
    // a leftover .compact-old is the dangerous one: on HDFS, rename(dst, old)
    // with old existing moves the table INTO it as a child — compact must
    // refuse up front rather than guess at the crashed run's state
    for (leftover <- Seq(".compact-old", ".compact-tmp")) {
      val stale = new java.io.File(dir + leftover)
      assert(stale.mkdirs())
      intercept[IllegalArgumentException](Layout.compact(spark, dir, "k", 2))
      assert(stale.delete())
      // untouched: same rows, original (uncompacted) file layout
      assert(spark.read.parquet(dir).count() == 100L)
    }
    // with the leftovers cleared, the same compact succeeds
    Layout.compact(spark, dir, "k", 2)
    assert(spark.read.parquet(dir).count() == 100L)
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

  test("z-order: a predicate on EITHER dimension skips files; the 1-D sort prunes only its own key") {
    import spark.implicits._
    val base = java.nio.file.Files.createTempDirectory("zorder").toString
    // uniform 100×100 grid — every (x, y) combination present
    val grid = (0 until 10000).map(i => (i % 100, i / 100)).toDF("x", "y")
    Layout.writeSorted(grid, s"$base/sorted_x", "x", 16)
    Layout.writeZOrdered(grid, s"$base/zorder", "x", "y", 16)

    // pruning-reader model: file [flo, fhi] must be read iff it overlaps [lo, hi]
    def overlap(dir: String, c: String, lo: Int, hi: Int): Int =
      Layout.fileRanges(spark, dir, c).collect()
        .count { r => val flo = r.getInt(1); val fhi = r.getInt(2); fhi >= lo && flo <= hi }

    // selective on the SECOND dimension: the 1-D layout reads everything,
    // the z-layout skips most files (quadtree-block locality)
    assert(overlap(s"$base/sorted_x", "y", 10, 15) == 16,
      "every x-sorted file spans the full y domain")
    val zy = overlap(s"$base/zorder", "y", 10, 15)
    assert(zy <= 8, s"z-order should skip most files on a y-band, touched $zy/16")
    // selective on x: the 1-D sort is near-perfect, z-order still prunes
    assert(overlap(s"$base/sorted_x", "x", 10, 15) <= 3)
    val zx = overlap(s"$base/zorder", "x", 10, 15)
    assert(zx <= 8, s"z-order should keep x locality too, touched $zx/16")
    // layout changes nothing about the data
    val got = spark.read.parquet(s"$base/zorder").as[(Int, Int)].collect().toSet
    assert(got == (0 until 10000).map(i => (i % 100, i / 100)).toSet)
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
