package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{BitmapAndCount, BitmapBits, BitmapCardinality, BitmapDistinct}

/** Paged-bitmap exact distinct (q81): exactness vs countDistinct on real
  * data, negative/sparse id handling (zigzag + paging), and
  * partitioning-insensitivity of the OR-merge.
  */
class BitmapSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()
  val sf = "/root/testdata/sf0.001"

  test("bitmap distinct equals countDistinct per group on events") {
    val got = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(BitmapDistinct(col("user_id")).as("bm"),
        countDistinct(col("user_id")).as("cd"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      assert(r.getLong(1) == r.getLong(2), s"${r.getString(0)}: bitmap=${r.getLong(1)} exact=${r.getLong(2)}")
    }
  }

  test("negative, sparse, and duplicate ids count exactly (zigzag + paging)") {
    import spark.implicits._
    val ids = Seq(-5L, -5L, -1L, 0L, 0L, 1L, 4095L, 4096L, 1L << 40, (1L << 40) + 1, Long.MinValue / 2)
    val df = ids.toDF("id")
    val n = df.agg(BitmapDistinct(col("id")).as("n")).head().getLong(0)
    assert(n == ids.distinct.size, s"got $n, want ${ids.distinct.size}")
  }

  test("nulls are ignored, empty input counts zero") {
    import spark.implicits._
    val df = Seq[Option[Long]](Some(7L), None, Some(7L), None).toDF("id")
    assert(df.agg(BitmapDistinct(col("id"))).head().getLong(0) == 1L)
    assert(df.filter(col("id") > 100).agg(BitmapDistinct(col("id"))).head().getLong(0) == 0L)
  }

  test("count is partitioning-insensitive (OR-merge is associative/commutative)") {
    val base = Tables.events(spark, sf)
    val a = base.repartition(1).agg(BitmapDistinct(col("user_id"))).head().getLong(0)
    val b = base.repartition(17, col("event_id")).agg(BitmapDistinct(col("user_id"))).head().getLong(0)
    val exact = base.agg(countDistinct(col("user_id"))).head().getLong(0)
    assert(a == exact && b == exact, s"layout changed the count: $a / $b vs $exact")
  }

  test("bitmap_bits round-trips: cardinality of the emitted bytes equals bitmap_distinct") {
    val got = Tables.events(spark, sf)
      .groupBy(col("event_type"))
      .agg(BitmapCardinality(BitmapBits(col("user_id"))).as("card"),
        BitmapDistinct(col("user_id")).as("n"))
      .collect()
    assert(got.nonEmpty)
    got.foreach(r => assert(r.getLong(1) == r.getLong(2), r.toString))
  }

  test("bitmap_and_count equals the exact set intersection, incl. negatives, page straddles, empty") {
    import spark.implicits._
    // ids chosen to hit: same page, different pages, page boundary 4095/4096,
    // far page (1<<40), negatives (zigzag), and asymmetric membership
    val aIds = Seq(-5L, 0L, 1L, 4095L, 4096L, 1L << 40, 77L)
    val bIds = Seq(-5L, 1L, 4096L, (1L << 40) + 1, 99L)
    val df = (aIds.map(("a", _)) ++ bIds.map(("b", _))).toDF("seg", "id")
    val seg = df.groupBy(col("seg")).agg(BitmapBits(col("id")).as("bits"))
    val a = seg.filter(col("seg") === "a").select(col("bits").as("ba"))
    val b = seg.filter(col("seg") === "b").select(col("bits").as("bb"))
    val ov = a.crossJoin(b)
      .select(BitmapAndCount(col("ba"), col("bb")).as("ov"))
      .head().getLong(0)
    assert(ov == aIds.toSet.intersect(bIds.toSet).size,
      s"got $ov want ${aIds.toSet.intersect(bIds.toSet).size}")
    // disjoint segments intersect to zero
    val c = Seq(123456789L).toDF("id").agg(BitmapBits(col("id")).as("bc"))
    val z = a.crossJoin(c).select(BitmapAndCount(col("ba"), col("bc"))).head().getLong(0)
    assert(z == 0L)
  }
}
