package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.operators.Packing

class PackingSpec extends AnyFunSuite {
  lazy val spark: SparkSession = GraftSession.builder("local[4]").getOrCreate()

  test("two-phase prefix sum equals the single-task global window exactly") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val df = (0 until 5000).map(i => (i.toLong * 3 + 1, rnd.nextInt(500) + 1))
      .toDF("k", "v").repartition(16) // scrambled input partitioning
    val twoPhase = Packing.exclusivePrefixSum(df, "k", "v", "pre", numBuckets = 8)
      .select($"k", $"pre").as[(Long, Long)].collect().toMap
    val w = Window.orderBy($"k").rowsBetween(Window.unboundedPreceding, -1)
    val global = df.withColumn("pre", coalesce(sum($"v").over(w), lit(0L)))
      .select($"k", $"pre").as[(Long, Long)].collect().toMap
    assert(twoPhase.size == 5000)
    assert(twoPhase == global)
  }

  test("packByBudget: packs are contiguous in key order and respect the budget boundary") {
    import spark.implicits._
    val df = (1L to 300L).map(k => (k, 70)).toDF("k", "tok")
    val packed = Packing.packByBudget(df, "k", "tok", budget = 1000L)
      .select($"k", $"pack_id").as[(Long, Long)].collect().sortBy(_._1)
    // pack id never decreases in key order (contiguity)
    assert(packed.sliding(2).forall { case Array((_, a), (_, b)) => a <= b; case _ => true })
    // doc k starts at (k-1)*70 tokens: pack must be floor of that over 1000
    assert(packed.forall { case (k, p) => p == (k - 1) * 70 / 1000 })
  }

  test("more partitions than rows: empty partitions contribute zero offsets") {
    import spark.implicits._
    val df = Seq((1L, 5), (2L, 7), (3L, 11)).toDF("k", "v")
    val got = Packing.exclusivePrefixSum(df, "k", "v", "pre", numBuckets = 8)
      .select($"k", $"pre").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 0L, 2L -> 5L, 3L -> 12L))
  }

  test("uniformRange literal bounds == quantile bounds bit-for-bit (grouped and ungrouped)") {
    import spark.implicits._
    import graft.operators.Sampling
    // hash-derived keys (the mid-square priority / q174 shuffle-key
    // family): the uniform-bounds fast path must reproduce the quantile
    // path EXACTLY — the prefix sum is invariant under any contiguous
    // range split, so only the bucket boundaries differ, never the sums
    val rows = (0L until 4000L).map { id =>
      val x = (id + 17) % Sampling.M
      val h = x * x % Sampling.M * Sampling.A % Sampling.M
      (id, h * 4294967296L + id, (id % 37 + 1).toInt)
    }.toDF("id", "k", "v").repartition(16)
    val range = Some((0L, (Sampling.M - 1) * 4294967296L))
    val fast = Packing.exclusivePrefixSum(rows, "k", "v", "pre",
        numBuckets = 8, uniformRange = range)
      .select($"id", $"pre").as[(Long, Long)].collect().toMap
    val slow = Packing.exclusivePrefixSum(rows, "k", "v", "pre",
        numBuckets = 8)
      .select($"id", $"pre").as[(Long, Long)].collect().toMap
    assert(fast.size == 4000 && fast == slow)
    // grouped: same invariance with group columns in play
    val grouped = rows.withColumn("g", ($"id" % 3).cast("string"))
    val gFast = Packing.groupedExclusivePrefixSum(grouped, Seq("g"),
        "k", "id", "v", "pre", numBuckets = 8, uniformRange = range)
      .select($"id", $"pre").as[(Long, Long)].collect().toMap
    val gSlow = Packing.groupedExclusivePrefixSum(grouped, Seq("g"),
        "k", "id", "v", "pre", numBuckets = 8)
      .select($"id", $"pre").as[(Long, Long)].collect().toMap
    assert(gFast.size == 4000 && gFast == gSlow)
    // materialize=false (plain two-pass lineage, no localCheckpoint
    // snapshot — the cheap-value-chain opt-out) must be bit-identical
    // on both shapes
    val fastNoSnap = Packing.exclusivePrefixSum(rows, "k", "v", "pre",
        numBuckets = 8, uniformRange = range, materialize = false)
      .select($"id", $"pre").as[(Long, Long)].collect().toMap
    assert(fastNoSnap == slow)
    val gFastNoSnap = Packing.groupedExclusivePrefixSum(grouped, Seq("g"),
        "k", "id", "v", "pre", numBuckets = 8, uniformRange = range,
        materialize = false)
      .select($"id", $"pre").as[(Long, Long)].collect().toMap
    assert(gFastNoSnap == gSlow)
  }

  test("token-true packing: BPE counts through the two-phase plan equal the global window (q141 shape)") {
    import spark.implicits._
    import graft.operators.Bpe
    // real sub-word counts from the q140 tokenizer drive the pack
    // assignment; equality against the single-task global window proves
    // the distributed prefix sum is count-agnostic (skewed, small,
    // zero-token docs included — the empty doc exercises v=0)
    val docs = Tables.documents(spark, "/root/testdata/sf0.001")
      .select($"doc_id", Bpe.tokenCount(Bpe.encode($"text")).as("n_tok"))
      .union(Seq((100000L, 0L)).toDF("doc_id", "n_tok")) // zero-token doc
    val twoPhase = Packing.packByBudget(docs, "doc_id", "n_tok", budget = 512L)
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    val w = Window.orderBy($"doc_id").rowsBetween(Window.unboundedPreceding, -1)
    val global = docs
      .withColumn("pack_id", (coalesce(sum($"n_tok").over(w), lit(0L)) / 512L).cast("long"))
      .select($"doc_id", $"pack_id").as[(Long, Long)].collect().toMap
    assert(twoPhase.size == 501 && twoPhase == global)
    // budget actually bins: more than one pack, ids contiguous from 0
    val packs = twoPhase.values.toSet
    assert(packs.size > 1 && packs == (0L until packs.size).toSet)
  }
}
