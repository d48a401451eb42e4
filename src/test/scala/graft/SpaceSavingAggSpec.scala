package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.SpaceSavingAgg

/** The Space-Saving TypedImperativeAggregate: invariants that hold under
  * EVERY partitioning/merge order (the summary carries its own proof):
  * per-key lb <= exact <= ub, absent keys bounded by the floor, exact
  * degeneration when capacity covers the key space — batch AND as
  * accumulating streaming state across chunked micro-batches.
  */
class SpaceSavingAggSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  // skewed stream: one hot key (10k), 200 tail keys x 10
  private def skewed: Seq[String] =
    Seq.fill(10000)("hot") ++ (0 until 200).flatMap(i => Seq.fill(10)(s"t$i"))

  private def exactCounts(xs: Seq[String]): Map[String, Long] =
    xs.groupBy(identity).view.mapValues(_.length.toLong).toMap

  private def checkGuarantees(row: Row, exact: Map[String, Long]): Unit = {
    val floor = row.getLong(0)
    val entries = row.getSeq[Row](1).map(e => (e.getString(0), e.getLong(1), e.getLong(2)))
    val present = entries.map(_._1).toSet
    entries.foreach { case (k, lb, ub) =>
      val ex = exact.getOrElse(k, 0L)
      assert(lb <= ex && ex <= ub, s"$k: exact $ex outside [$lb, $ub]")
    }
    exact.foreach { case (k, ex) =>
      if (!present.contains(k))
        assert(ex <= floor, s"absent $k has exact $ex > floor $floor")
    }
  }

  test("batch: sandwich + containment on a skewed stream, hot key surfaced, under scrambled partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val data = rnd.shuffle(skewed)
    val row = data.toDF("k").repartition(16)
      .agg(SpaceSavingAgg(col("k"), 8).as("hh"))
      .select("hh.*").head()
    checkGuarantees(row, exactCounts(data))
    val entries = row.getSeq[Row](1).map(e => (e.getString(0), e.getLong(1), e.getLong(2)))
    assert(entries.exists(_._1 == "hot"), "the 50%-mass key must survive every eviction")
    // the hot key's mass dominates the floor, so it is PROVABLY heavy
    // from the summary alone: lb > floor
    val hot = entries.find(_._1 == "hot").get
    assert(hot._2 > row.getLong(0), s"hot lb ${hot._2} should exceed floor ${row.getLong(0)}")
  }

  test("capacity >= key space degenerates to exact counts with floor 0") {
    import spark.implicits._
    val data = Seq("a", "b", "a", "c", "a", "b")
    val row = data.toDF("k").repartition(3)
      .agg(SpaceSavingAgg(col("k"), 8).as("hh")).select("hh.*").head()
    assert(row.getLong(0) == 0L)
    val entries = row.getSeq[Row](1).map(e => (e.getString(0), e.getLong(1), e.getLong(2)))
    assert(entries.toSet == Set(("a", 3L, 3L), ("b", 2L, 2L), ("c", 1L, 1L)))
  }

  test("plans as partial + final ObjectHashAggregate: the shuffle carries O(k) summaries") {
    import spark.implicits._
    val df = Seq("a", "b", "a").toDF("k").repartition(4)
      .agg(SpaceSavingAgg(col("k"), 8).as("hh"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("ObjectHashAggregate".r.findAllIn(p).size >= 2,
      s"expect partial + final ObjectHashAggregate:\n${p.take(800)}")
    assert(p.contains("space_saving"), "the SpaceSavingAgg expression must be in the plan")
  }

  test("serialize/deserialize round-trips the summary") {
    val agg = SpaceSavingAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val buf = agg.createAggregationBuffer()
    Seq("a", "b", "c", "d", "e", "a", "e", "f").foreach(buf.update)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.k == buf.k && back.absentBound == buf.absentBound && back.counts == buf.counts)
  }

  test("streaming complete-mode heavy hitters: guarantees hold across chunked micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // events-shaped input: (event_type, user_id) with the skewed users
    val rnd = new scala.util.Random(11)
    val data = rnd.shuffle(skewed).map(u => ("click", u))
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    val q = graft.streaming.EventStream.heavyHitters(
        input.toDF().toDF("event_type", "user_id"), k = 8)
      .writeStream.format("memory").queryName("ss_hh").outputMode("complete").start()
    try {
      data.grouped(data.size / 3 + 1).foreach { chunk =>
        input.addData(chunk: _*); q.processAllAvailable()
      }
      val row = spark.table("ss_hh").filter($"event_type" === "click")
        .select("hh.*").head()
      checkGuarantees(row, exactCounts(data.map(_._2)))
      val entries = row.getSeq[Row](1).map(_.getString(0))
      assert(entries.contains("hot"))
    } finally q.stop()
  }

  test("keys past writeUTF's 65535-byte ceiling survive serialize (length-prefixed raw UTF-8)") {
    // full documents are legitimate heavy-hitter keys; writeUTF would
    // throw UTFDataFormatException at shuffle/state-serialize time.
    // Multi-byte chars make the BYTE length (3x char count) the binding
    // constraint, the exact writeUTF failure mode.
    val big1 = "€" * 30000 // 90000 UTF-8 bytes
    val big2 = "x" * 70000      // 70000 UTF-8 bytes
    val agg = SpaceSavingAgg(org.apache.spark.sql.catalyst.expressions.Literal("x"), 4)
    val buf = agg.createAggregationBuffer()
    Seq(big1, big2, big1, "small").foreach(buf.update)
    val back = agg.deserialize(agg.serialize(buf))
    assert(back.counts == buf.counts, "long keys must round-trip bit-exact")
    // and through a real partial/final plan (shuffle serializes buffers)
    import spark.implicits._
    val row = Seq(big1, big2, big1, "small").toDF("k").repartition(4)
      .agg(SpaceSavingAgg(col("k"), 8).as("hh")).select("hh.*").head()
    val entries = row.getSeq[Row](1).map(e => (e.getString(0), e.getLong(2)))
    assert(entries.contains((big1, 2L)) && entries.contains((big2, 1L)))
  }
}
