package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Merge

class MergeSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  test("upsert applies update/delete/insert in one pass and leaves the rest untouched") {
    import spark.implicits._
    val snapshot = Seq(
      (1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0), (4L, "d", 40.0)
    ).toDF("k", "name", "v")
    val changes = Seq(
      (2L, "B2", 99.0, "U"),  // update: full-row replace
      (3L, "",   0.0,  "D"),  // delete: payload ignored
      (9L, "i",  5.0,  "U")   // insert: new key
    ).toDF("k", "name", "v", "op")

    val got = Merge.upsert(snapshot, changes, "k")
      .orderBy($"k").as[(Long, String, Double)].collect().toSeq
    assert(got == Seq((1L, "a", 10.0), (2L, "B2", 99.0), (4L, "d", 40.0), (9L, "i", 5.0)))
  }

  test("the snapshot is scanned once: change KEYS broadcast into the anti-join") {
    import spark.implicits._
    val snapshot = (1L to 1000L).map(i => (i, s"n$i", i * 1.0)).toDF("k", "name", "v")
    val changes = Seq((5L, "x", 0.0, "U")).toDF("k", "name", "v", "op")
    val p = Merge.upsert(snapshot, changes, "k").queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin") && p.contains("LeftAnti"), p.take(600))
    assert(!p.contains("SortMergeJoin"), "anti-join must not shuffle the snapshot")
  }

  test("versioned table: applies commit immutable vN+1; every version stays time-travel readable") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("merge_vt").toString + "/tbl"
    Seq((1L, "a", 1.0), (2L, "b", 2.0)).toDF("k", "name", "v")
      .write.parquet(s"$dir/v0")
    assert(Merge.latestVersion(spark, dir) == 0L)

    val v1 = Merge.applyVersioned(spark, dir,
      Seq((2L, "B", 9.0, "U"), (3L, "c", 3.0, "U")).toDF("k", "name", "v", "op"), "k")
    val v2 = Merge.applyVersioned(spark, dir,
      Seq((1L, "", 0.0, "D")).toDF("k", "name", "v", "op"), "k")
    assert((v1, v2) == (1L, 2L) && Merge.latestVersion(spark, dir) == 2L)

    def snap(v: Long) = Merge.readVersion(spark, dir, v)
      .orderBy($"k").as[(Long, String, Double)].collect().toSeq
    // history is immutable: each version still reads back exactly
    assert(snap(0) == Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    assert(snap(1) == Seq((1L, "a", 1.0), (2L, "B", 9.0), (3L, "c", 3.0)))
    assert(snap(2) == Seq((2L, "B", 9.0), (3L, "c", 3.0)))

    // retention: vacuum keeps the newest 2, drops v0, never the latest
    assert(Merge.vacuum(spark, dir, keepLast = 2) == Seq(0L))
    assert(Merge.latestVersion(spark, dir) == 2L)
    assert(snap(2) == Seq((2L, "B", 9.0), (3L, "c", 3.0)))
    intercept[Exception](snap(0)) // vacuumed version fails loudly, not silently
    assert(Merge.vacuum(spark, dir, keepLast = 0) == Seq(1L)) // clamped to keep >= 1
    assert(snap(2).nonEmpty)
  }
}
