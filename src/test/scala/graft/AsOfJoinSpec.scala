package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.plans.AsOfJoin

/** The native sorted-merge AS-OF join (plans/AsOfJoin): semantics vs a
  * brute-force reference, null pins, self-source dedup, and the physical
  * contract (AsOfJoinExec planned, exactly one shuffle per side).
  */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  /** Brute-force reference: per left row, max right time <= left time via
    * a theta join + grouped max — O(n·m), test-only.
    */
  private def reference(left: Seq[(Long, Long, Long)], right: Seq[(Long, Long, Long)])
      : Set[(Long, Option[Long])] =
    left.map { case (lid, lk, lt) =>
      val best = right.filter { case (_, rk, rt) => rk == lk && rt <= lt }
        .sortBy(r => (r._3, r._1)).lastOption
      (lid, best.map(_._1))
    }.toSet

  test("native as-of equals the brute-force reference (ties, misses, interleaved keys)") {
    import spark.implicits._
    // deterministic adversarial shape: multiple keys interleaved, exact
    // time ties (boundary <=), left rows before any right row (miss),
    // keys present on only one side
    val leftRows = for (i <- 0L until 200L) yield (i, i % 7, (i * 13) % 101)
    val rightRows = for (j <- 0L until 150L) yield (j + 1000, j % 5, (j * 17) % 101)
    val l = leftRows.toDF("lid", "k", "t")
    val r = rightRows.toDF("rid", "rk", "rt")
    val got = AsOfJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select($"lid", $"rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    val exp = reference(leftRows, rightRows.map(r => (r._1, r._2, r._3)))
    // ties on (rk, rt) between distinct rids are resolved arbitrarily by
    // the merge (last in sort order); this fixture has no such ties —
    // assert that precondition so the equality below stays meaningful
    assert(rightRows.groupBy(r => (r._2, r._3)).forall(_._2.size == 1))
    assert(got == exp)
    assert(exp.exists(_._2.isEmpty) && exp.exists(_._2.nonEmpty),
      "fixture must exercise both match and miss paths")
  }

  test("boundary: right time EQUAL to left time matches (<=, not <)") {
    import spark.implicits._
    val l = Seq((1L, 10L, 100L)).toDF("lid", "k", "t")
    val r = Seq((7L, 10L, 100L)).toDF("rid", "rk", "rt")
    val got = AsOfJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select($"rid").collect()
    assert(got.length == 1 && got(0).getLong(0) == 7L)
  }

  test("null pins: null left key/time -> null match; null right key/time skipped, not blocking") {
    import spark.implicits._
    val l = Seq((1L, Some(5L), Some(50L)), (2L, None, Some(50L)), (3L, Some(5L), None))
      .toDF("lid", "k", "t")
    // a null-time right row sorts FIRST within the key and must not stall
    // the merge before the valid row behind it
    val r = Seq((70L, Some(5L), None), (71L, Some(5L), Some(40L)), (72L, None, Some(1L)))
      .toDF("rid", "rk", "rt")
    val got = AsOfJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select($"lid", $"rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got == Map(1L -> Some(71L), 2L -> None, 3L -> None))
  }

  test("self-source frames (shared attribute ids) are deduplicated and correct") {
    import spark.implicits._
    val base = (0L until 100L).map(i => (i, i % 3, (i * 7) % 50, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "k", "t", "side")
    val l = base.filter($"side" === "a").select($"id", $"k", $"t")
    val r = base.filter($"side" === "b").select($"id".as("rid"), $"k".as("rk"), $"t".as("rt"))
    val got = AsOfJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
    // correctness via the reference, not just "it ran"
    val lref = base.filter($"side" === "a").collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val rref = base.filter($"side" === "b").collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(rref.groupBy(r => (r._2, r._3)).forall(_._2.size == 1))
    val gotSet = got.select($"id", $"rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    assert(gotSet == reference(lref.toSeq, rref.toSeq))
  }

  test("physical contract: AsOfJoinExec planned, one shuffle per side, sorts on (key, time)") {
    import spark.implicits._
    val l = (0L until 1000L).map(i => (i, i % 11, i % 97)).toDF("lid", "k", "t")
    val r = (0L until 800L).map(j => (j, j % 11, j % 89)).toDF("rid", "rk", "rt")
    val df = AsOfJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), s"native exec missing from plan:\n$p")
    val shuffles = p.linesIterator.count(_.contains("Exchange"))
    assert(shuffles == 2, s"expected exactly 2 shuffles (one per side), got $shuffles:\n$p")
    val sorts = p.linesIterator.filter(_.contains("Sort ")).toSeq
    assert(sorts.size == 2 && sorts.forall(s => s.contains("k#") || s.contains("rk#")),
      s"expected both children sorted on (key, time):\n$p")
  }

  test("multi-key as-of joins on the full composite key") {
    import spark.implicits._
    val l = (0L until 120L).map(i => (i, i % 4, i % 3, (i * 5) % 60)).toDF("lid", "k1", "k2", "t")
    // 60 right rows: at j >= 60 the (key, time) pattern repeats (period
    // lcm(12, 60)), which would make tie-free reference comparison moot
    val r = (0L until 60L).map(j => (j + 500, j % 4, j % 3, (j * 11) % 60)).toDF("rid", "rk1", "rk2", "rt")
    val got = AsOfJoin.backward(l, r, Seq("k1", "k2"), Seq("rk1", "rk2"), "t", "rt")
      .select($"lid", $"rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    // composite-key reference: fold both keys into one for the helper
    val lref = (0L until 120L).map(i => (i, (i % 4) * 10 + i % 3, (i * 5) % 60))
    val rref = (0L until 60L).map(j => (j + 500, (j % 4) * 10 + j % 3, (j * 11) % 60))
    assert(rref.groupBy(r => (r._2, r._3)).forall(_._2.size == 1))
    assert(got == reference(lref, rref))
  }

  test("forward as-of equals its brute-force reference and pins the >= boundary") {
    import spark.implicits._
    val leftRows = for (i <- 0L until 200L) yield (i, i % 7, (i * 13) % 101)
    val rightRows = for (j <- 0L until 150L) yield (j + 1000, j % 5, (j * 17) % 101)
    val l = leftRows.toDF("lid", "k", "t")
    val r = rightRows.toDF("rid", "rk", "rt")
    val got = AsOfJoin.forward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select($"lid", $"rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
    val exp = leftRows.map { case (lid, lk, lt) =>
      val best = rightRows.filter { case (_, rk, rt) => rk == lk && rt >= lt }
        .sortBy(r => (r._3, r._1)).headOption
      (lid, best.map(_._1))
    }.toSet
    assert(rightRows.groupBy(r => (r._2, r._3)).forall(_._2.size == 1))
    assert(got == exp)
    assert(exp.exists(_._2.isEmpty) && exp.exists(_._2.nonEmpty))
    // boundary: equal time matches in the forward direction too
    val lb = Seq((1L, 3L, 50L)).toDF("lid", "k", "t")
    val rb = Seq((9L, 3L, 50L)).toDF("rid", "rk", "rt")
    val b = AsOfJoin.forward(lb, rb, Seq("k"), Seq("rk"), "t", "rt").select($"rid").collect()
    assert(b.length == 1 && b(0).getLong(0) == 9L)
  }

  test("forward null pins: null-time rows sort LAST under Descending and still don't block") {
    import spark.implicits._
    val l = Seq((1L, Some(5L), Some(50L)), (2L, Some(5L), None)).toDF("lid", "k", "t")
    val r = Seq((70L, Some(5L), None), (71L, Some(5L), Some(60L)), (72L, None, Some(1L)))
      .toDF("rid", "rk", "rt")
    val got = AsOfJoin.forward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select($"lid", $"rid").collect()
      .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toMap
    assert(got == Map(1L -> Some(71L), 2L -> None))
  }

  test("hot key: 1e5 rows on ONE key both sides streams through in constant state") {
    import spark.implicits._
    // the merge holds one right row regardless of group size — a hot key
    // is a time concentration, never a memory one. Deterministic check:
    // left t = 2i matches right t = 2i (equal) -> rid = i exactly
    val l = (0L until 100000L).map(i => (i, 1L, 2 * i)).toDF("lid", "k", "t")
    val r = (0L until 100000L).map(j => (j, 1L, 2 * j)).toDF("rid", "rk", "rt")
    val got = AsOfJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select($"lid", $"rid").collect()
    assert(got.length == 100000)
    assert(got.forall(x => !x.isNullAt(1) && x.getLong(1) == x.getLong(0)),
      "each left row must match the equal-time right row")
  }

  test("degenerate inputs: empty right side -> all misses; empty left -> empty result") {
    import spark.implicits._
    val l = Seq((1L, 2L, 3L), (2L, 2L, 9L)).toDF("lid", "k", "t")
    val r = Seq.empty[(Long, Long, Long)].toDF("rid", "rk", "rt")
    val allMiss = AsOfJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
      .select($"lid", $"rid").collect()
    assert(allMiss.length == 2 && allMiss.forall(_.isNullAt(1)))
    val none = AsOfJoin.backward(r.toDF("lid", "k", "t"), l.toDF("rid", "rk", "rt"),
      Seq("k"), Seq("rk"), "t", "rt").collect()
    assert(none.isEmpty)
  }

  test("property: both directions equal the brute-force reference on random tie-free inputs") {
    import spark.implicits._
    import org.scalacheck.{Gen, Prop, Test => SCTest}
    // each trial is a pair of Spark jobs — keep the trial count modest;
    // the deterministic suites above cover the named edges, this sweeps
    // the space (random key skew, empty sides, all-miss, all-match)
    val pairs = Gen.listOfN(40, Gen.zip(Gen.choose(0L, 4L), Gen.choose(0L, 60L)))
    val prop = Prop.forAll(pairs, pairs) { (lRaw, rRaw) =>
      // right side must be (key, time)-unique or the matched rid is
      // ambiguous by spec; left may tie freely
      val rSet = rRaw.distinct
      val lRows = lRaw.zipWithIndex.map { case ((k, t), i) => (i.toLong, k, t) }
      val rRows = rSet.zipWithIndex.map { case ((k, t), j) => (j + 1000L, k, t) }
      val l = lRows.toDF("lid", "k", "t")
      val r = rRows.toDF("rid", "rk", "rt")
      def run(fwd: Boolean) = {
        val df = if (fwd) AsOfJoin.forward(l, r, Seq("k"), Seq("rk"), "t", "rt")
          else AsOfJoin.backward(l, r, Seq("k"), Seq("rk"), "t", "rt")
        df.select($"lid", $"rid").collect()
          .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
      }
      def ref(fwd: Boolean) = lRows.map { case (lid, lk, lt) =>
        val cands = rRows.filter { case (_, rk, rt) =>
          rk == lk && (if (fwd) rt >= lt else rt <= lt) }
        val best = if (fwd) cands.sortBy(c => (c._3, c._1)).headOption
          else cands.sortBy(c => (c._3, c._1)).lastOption
        (lid, best.map(_._1))
      }.toSet
      run(fwd = false) == ref(fwd = false) && run(fwd = true) == ref(fwd = true)
    }
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), prop)
    assert(res.passed, res.status.toString)
  }

  test("API misuse fails loudly: missing column, mismatched key types") {
    import spark.implicits._
    val l = Seq((1L, 2L, 3L)).toDF("lid", "k", "t")
    val r = Seq((1L, 2L, 3L)).toDF("rid", "rk", "rt")
    val e1 = intercept[IllegalArgumentException](
      AsOfJoin.backward(l, r, Seq("nope"), Seq("rk"), "t", "rt"))
    assert(e1.getMessage.contains("no column 'nope'"))
    val rStr = r.withColumn("rk", $"rk".cast("string"))
    val e2 = intercept[IllegalArgumentException](
      AsOfJoin.backward(l, rStr, Seq("k"), Seq("rk"), "t", "rt"))
    assert(e2.getMessage.contains("key types must match"))
    // unorderable key type fails at construction, not mid-job
    val lMap = l.withColumn("k", map(lit("a"), $"k"))
    val rMap = r.withColumn("rk", map(lit("a"), $"rk"))
    val e3 = intercept[IllegalArgumentException](
      AsOfJoin.backward(lMap, rMap, Seq("k"), Seq("rk"), "t", "rt"))
    assert(e3.getMessage.contains("unorderable"))
  }

  test("bucketed+sorted layout: as-of join runs with NO exchange and NO sort at all") {
    import spark.implicits._
    // the scaladoc's claim made executable: an upstream layout that
    // already satisfies ClusteredDistribution + (key, time) ordering —
    // bucketed-by-key tables sorted by (key, time), one file per bucket
    // — lets EnsureRequirements elide BOTH the shuffles and the sorts;
    // at 100 TB the as-of join over a properly laid-out lake is a pure
    // zero-movement merge (the BucketingSpec amortization applied to
    // the custom exec: its declared requirements compose with Spark's
    // planner exactly like SortMergeJoin's)
    spark.sql("CREATE DATABASE IF NOT EXISTS asof_bkt")
    for (t <- Seq("l", "r")) {
      spark.sql(s"DROP TABLE IF EXISTS asof_bkt.$t")
      val loc = new java.io.File(s"spark-warehouse/asof_bkt.db/$t")
      if (loc.exists()) {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(); ()
        }
        rm(loc)
      }
    }
    val leftRows = for (i <- 0L until 500L) yield (i, i % 13, (i * 7) % 331)
    val rightRows = for (j <- 0L until 400L) yield (j + 10000, j % 11, (j * 5) % 331)
    leftRows.toDF("lid", "k", "t").repartition(8, $"k")
      .write.bucketBy(8, "k").sortBy("k", "t").saveAsTable("asof_bkt.l")
    rightRows.toDF("rid", "rk", "rt").repartition(8, $"rk")
      .write.bucketBy(8, "rk").sortBy("rk", "rt").saveAsTable("asof_bkt.r")
    try {
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
      val df = AsOfJoin.backward(
        spark.table("asof_bkt.l"), spark.table("asof_bkt.r"),
        Seq("k"), Seq("rk"), "t", "rt")
      val got = df.select($"lid", $"rid").collect()
        .map(x => (x.getLong(0), if (x.isNullAt(1)) None else Some(x.getLong(1)))).toSet
      val p = df.queryExecution.executedPlan.toString
      assert(p.contains("AsOfJoin"), s"native exec missing:\n${p.take(600)}")
      assert(!p.linesIterator.exists(_.contains("Exchange")),
        s"bucketed as-of inputs must not shuffle:\n${p.take(800)}")
      assert(!p.linesIterator.exists(_.contains("Sort ")),
        s"bucket-sorted as-of inputs must not re-sort:\n${p.take(800)}")
      // and the zero-movement plan is still CORRECT
      assert(got == reference(leftRows, rightRows))
    } finally
      spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "false")
  }
}
