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
}
