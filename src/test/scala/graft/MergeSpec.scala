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

  test("lifecycle composition: CDC apply → compact the new snapshot → time travel → vacuum") {
    import spark.implicits._
    import graft.operators.Layout
    val dir = java.nio.file.Files.createTempDirectory("merge_life").toString + "/tbl"
    // seed v0 fragmented (8 files) — the state incremental ingest leaves
    (1L to 50L).map(i => (i, s"n$i", i * 1.0)).toDF("k", "name", "v")
      .repartition(8).write.parquet(s"$dir/v0")

    // 1. CDC apply commits v1 (delete k=1, insert k=51)
    val v1 = Merge.applyVersioned(spark, dir,
      Seq((1L, "", 0.0, "D"), (51L, "x", 51.0, "U")).toDF("k", "name", "v", "op"), "k",
      expectedVersion = 0L)
    assert(v1 == 1L)

    // 2. lake maintenance: compact the NEW snapshot in place; the commit
    //    marker and content must survive the write-audit-publish swap
    Layout.compact(spark, s"$dir/v1", "k", 2)
    assert(Merge.latestVersion(spark, dir) == 1L,
      "compaction must not un-commit the snapshot")
    assert(new java.io.File(s"$dir/v1").listFiles()
      .count(_.getName.endsWith(".parquet")) == 2)
    val expectV1 = (2L to 50L).map(i => (i, s"n$i", i * 1.0)) :+ ((51L, "x", 51.0))
    assert(Merge.readVersion(spark, dir, 1L).orderBy($"k")
      .as[(Long, String, Double)].collect().toSeq == expectV1)

    // 3. time travel: v0 is bit-identical through both apply and compact
    assert(Merge.readVersion(spark, dir, 0L).orderBy($"k")
      .as[(Long, String, Double)].collect().toSeq ==
      (1L to 50L).map(i => (i, s"n$i", i * 1.0)))

    // 4. retention: vacuum drops v0 only; the compacted latest still reads
    assert(Merge.vacuum(spark, dir, keepLast = 1) == Seq(0L))
    assert(Merge.readVersion(spark, dir, 1L).count() == 50L)
    intercept[Exception](Merge.readVersion(spark, dir, 0L).count())
  }

  test("crash-safety: an uncommitted v dir (no _SUCCESS) is invisible; expectedVersion gates replay") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("merge_crash").toString + "/tbl"
    Seq((1L, "a", 1.0)).toDF("k", "name", "v").write.parquet(s"$dir/v0")
    // simulate a crash mid-write of v1: the dir exists with data files but
    // the committer never wrote _SUCCESS
    assert(new java.io.File(s"$dir/v1").mkdirs())
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$dir/v1/part-00000.parquet"), "partial garbage")
    assert(Merge.latestVersion(spark, dir) == 0L,
      "a partial snapshot must not count as committed")
    // a replay that declares its base deterministically REWRITES v1 from v0
    // instead of minting v2 on top of the partial dir
    val v1 = Merge.applyVersioned(spark, dir,
      Seq((2L, "b", 2.0, "U")).toDF("k", "name", "v", "op"), "k", expectedVersion = 0L)
    assert(v1 == 1L && Merge.latestVersion(spark, dir) == 1L)
    assert(Merge.readVersion(spark, dir, 1L).orderBy($"k")
      .as[(Long, String, Double)].collect().toSeq == Seq((1L, "a", 1.0), (2L, "b", 2.0)))
    // a stale replay (the table has advanced past the declared base) fails
    // loudly instead of silently dropping the concurrent commit
    intercept[IllegalArgumentException] {
      Merge.applyVersioned(spark, dir,
        Seq((3L, "c", 3.0, "U")).toDF("k", "name", "v", "op"), "k", expectedVersion = 0L)
    }
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

  test("changeFeed: classifies insert/update/delete, drops unchanged, null payloads compare null-safely") {
    import spark.implicits._
    val prev = Seq(
      (1L, Option("a"), 1.0), // unchanged → must NOT emit
      (2L, Option("b"), 2.0), // updated value
      (3L, None: Option[String], 3.0), // null field on both sides → unchanged
      (4L, Option("d"), 4.0), // deleted
      (6L, None: Option[String], 6.0)) // null → non-null update
      .toDF("k", "name", "v")
    val cur = Seq(
      (1L, Option("a"), 1.0),
      (2L, Option("b"), 9.0),
      (3L, None: Option[String], 3.0),
      (5L, Option("e"), 5.0), // inserted
      (6L, Option("f"), 6.0))
      .toDF("k", "name", "v")
    val feed = Merge.changeFeed(prev, cur, Seq("k"))
      .select($"k", $"change_type").as[(Long, String)].collect().toMap
    // k=1 and k=3 absent: unchanged rows (incl. the both-null payload —
    // a =!= comparison would have mis-dropped k=6 and mis-kept k=3)
    assert(feed == Map(2L -> "update", 4L -> "delete", 5L -> "insert", 6L -> "update"),
      s"wrong feed: $feed")
    // payload structs carry old/new for consumers
    val upd = Merge.changeFeed(prev, cur, Seq("k"))
      .filter($"k" === 2L).select($"old.v", $"new.v").head()
    assert((upd.getDouble(0), upd.getDouble(1)) == (2.0, 9.0))
    // schema drift fails loudly, never silently diffs positionally
    val e = intercept[IllegalArgumentException](
      Merge.changeFeed(prev, cur.withColumnRenamed("v", "w"), Seq("k")))
    assert(e.getMessage.contains("schemas differ"))
    intercept[IllegalArgumentException](Merge.changeFeed(prev, cur, Seq.empty))
  }
}
