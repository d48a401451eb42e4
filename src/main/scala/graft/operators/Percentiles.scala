package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact linearly-interpolated percentiles per group, computed by
  * distributed rank selection instead of Spark's built-in `percentile`
  * aggregate.
  *
  * The built-in is exact but materializes a per-group value→count
  * OpenHashMap inside ONE aggregation buffer: for a high-cardinality
  * double column (prices, latencies) its size is O(distinct values in the
  * group) — an executor-memory bomb at 100 TB. This operator never holds
  * a group in one place:
  *
  *   1. bucket rows by GLOBAL approx-quantile bounds of the value column
  *      (bounds are literals in the plan — cross-job deterministic, the
  *      same trick as [[Packing]]);
  *   2. per-(group, bucket) counts → per-group exclusive bucket offsets
  *      (a tiny aggregate, windowed per group over ≤numBuckets rows);
  *   3. local rank = row_number over (group, bucket) — parallel windows,
  *      buckets split big groups so no single-task funnel — computed ONLY
  *      over the buckets whose global-rank interval contains a target
  *      rank (≤ 2·|specs| buckets per group, decided from the tiny
  *      count/offset table): every other bucket is filtered out BEFORE
  *      the ranking shuffle, so the sort input is a numBuckets-th of the
  *      data instead of all of it (r19 optimization, guide §2.3);
  *   4. global in-group rank = local + offset, matched against the target
  *      ranks ⌊p·(n−1)⌋+1 and +2 derived from the bucket counts (no
  *      separate per-group counting pass);
  *   5. interpolate `(1−frac)·vlo + frac·vhi` — bit-for-bit the formula
  *      of Spark's Percentile and DuckDB's QUANTILE_CONT.
  *
  * Exactness is pinned by PercentilesSpec (equality with the built-in on
  * real data, incl. tie-heavy columns and p ∈ {0, 1}) and by the q35
  * oracle staying green after the swap.
  */
object Percentiles {

  /** One output column per spec: (valueCol, p, outName). Returns one row
    * per group: groupCol plus every outName, ordered by nothing (caller
    * sorts).
    *
    * Null handling matches the built-in `percentile` for any group with at
    * least one non-null value (nulls are ignored, not ranked); a group
    * whose values are ALL null is omitted from the output, where the
    * built-in would emit a null row.
    */
  def exactInterpolated(df: DataFrame, groupCol: String,
                        specs: Seq[(String, Double, String)],
                        numBuckets: Int = 0,
                        envelope: Map[String, (Double, Double)] = Map.empty)
      : DataFrame = {
    require(specs.nonEmpty, "at least one (valueCol, p, outName) spec required")
    specs.foreach { case (_, p, _) => require(p >= 0.0 && p <= 1.0, s"p out of range: $p") }
    val spark = df.sparkSession
    val n = math.max(1, if (numBuckets > 0) numBuckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val byValueCol = specs.groupBy(_._1).toSeq
    val valueCols = byValueCol.map(_._1)
    // (r20 negative result, kept as a note: Scatter.even on the pruned
    // projection — spreading the fused counting job and the ranking
    // pass past the one-row-group scan — was tried and measured WORSE
    // (q88 build 0.6 -> 1.0 s, q214 build 0.5 -> 1.1 s): the per-row
    // work here is a |buckets|-deep when-fold plus a narrow explode,
    // too cheap to repay a full shuffle write+read, and the exchange
    // is re-paid by BOTH driver actions since exchanges are not reused
    // across jobs. The same lesson as r19's q137/q188/q189 revert:
    // scatter only pays for genuinely heavy scalar chains.)
    val pruned = df.select((groupCol +: valueCols).distinct.map(col): _*)
    // ONE approxQuantile pass computes every value column's bucket bounds
    // (the multi-column overload scans the input once), instead of one
    // driver job per distinct value column. Accuracy 0.01, not 0.001:
    // the bounds only BUCKET — the exact answer is rank-selected inside
    // whatever buckets result, identical under any contiguous split
    // (PercentilesSpec pins equality with the built-in) — so the sketch
    // precision buys nothing beyond balance, at ~2x the sketch cost.
    //
    // `envelope` (r19, the [[Packing.uniformBounds]] discipline): a
    // caller that KNOWS a column's value envelope a priori (a generator
    // law, a spec-bounded score) supplies (lo, hi) and that column's
    // bounds become evenly spaced literals — NO data pass. This is
    // correctness-free tuning in the strictest sense: bounds only
    // bucket, rank selection inside the buckets is exact under ANY
    // contiguous split, and values OUTSIDE a mis-stated envelope merely
    // land in the first/last bucket (balance degrades, the answer does
    // not). The sketch job runs only for columns without an envelope.
    val sketchCols = valueCols.filterNot(envelope.contains)
    val sketched: Map[String, Array[Double]] =
      if (n == 1 || sketchCols.isEmpty) Map.empty
      else sketchCols.zip(pruned.stat.approxQuantile(sketchCols.toArray,
        (1 until n).map(_.toDouble / n).toArray, 0.01)).toMap
    val boundsByCol: Map[String, Array[Double]] =
      valueCols.map { vc =>
        vc -> (if (n == 1) Array.empty[Double]
               else envelope.get(vc) match {
                 case Some((lo, hi)) =>
                   val step = (hi - lo) / n
                   (1 until n).map(i => lo + step * i).toArray
                 case None => sketched(vc)
               })
      }.toMap
    // ONE per-(group, column, bucket) counting job for ALL value columns
    // (each column's count row carries its column index): the counts
    // drive the driver-side rank restriction, and one fused aggregation
    // replaces |columns| scan+collect jobs. The fused limit is
    // (cap+1)·|columns|; if it comes back FULL the result may be
    // truncated arbitrarily across columns, so every column falls back
    // to its own capped collect (the pre-fusion path) — completeness is
    // only assumed when the limit was provably not hit.
    val fusedLimit = (MaxDriverCells + 1) * valueCols.size
    val cellStructs = valueCols.zipWithIndex.map { case (vc, i) =>
      val bkt = boundsByCol(vc).foldLeft(lit(0)) { (acc, b) =>
        acc + when(col(vc) > b, 1).otherwise(0)
      }
      struct(lit(i).as("ci"), bkt.as("bkt"), col(vc).isNotNull.as("nn"))
    }
    val fused = pruned
      .select(col(groupCol), explode(array(cellStructs: _*)).as("e"))
      .filter(col("e.nn"))
      .groupBy(col(groupCol), col("e.ci").as("ci"), col("e.bkt").as("bkt"))
      .agg(count(lit(1)).as("__c"))
      .limit(fusedLimit).collect()
    val cellsByCol: Option[Map[Int, Array[org.apache.spark.sql.Row]]] =
      if (fused.length >= fusedLimit) None
      else Some(fused.groupBy(_.getInt(1)).map { case (ci, rows) =>
        ci -> rows.map(r => org.apache.spark.sql.Row(r.get(0), r.getInt(2),
          r.getLong(3)))
      })
    byValueCol.zipWithIndex.map { case ((valueCol, colSpecs), ci) =>
      forOneColumn(pruned, groupCol, valueCol, colSpecs, boundsByCol(valueCol),
        cellsByCol.map(_.getOrElse(ci, Array.empty)))
    }.reduce((a, b) => a.join(b, Seq(groupCol)))
  }

  /** Local in-bucket rank window: buckets split big groups so no
    * single-task funnel, and partitioning carries the group key.
    */
  private def localW(groupCol: String, valueCol: String) =
    Window.partitionBy(col(groupCol), col("__bkt")).orderBy(col(valueCol))

  private def local(df: DataFrame,
                    w: org.apache.spark.sql.expressions.WindowSpec): DataFrame =
    df.withColumn("__local", row_number().over(w).cast("long"))

  /** Driver-materialization bound for the per-(group, bucket) count
    * table: at or under this many cells the offsets, target ranks and
    * needed-bucket set compute on the driver (the q84/q87
    * bounded-labeled-materialization class — the table is groups ×
    * numBuckets, the same control-plane size as the approxQuantile
    * bounds). Above it, the fully distributed pre-r19 plan runs
    * unchanged — a million-group input never funnels through the
    * driver.
    */
  val MaxDriverCells = 4096

  private def forOneColumn(df: DataFrame, groupCol: String, valueCol: String,
                           colSpecs: Seq[(String, Double, String)],
                           bounds: Array[Double],
                           precomputedCells: Option[Array[org.apache.spark.sql.Row]])
      : DataFrame = {
    val spark = df.sparkSession
    // nulls are ignored like the built-in percentile's (unfiltered they
    // would be counted in __n and ranked first by row_number)
    val projected = df.select(col(groupCol), col(valueCol))
      .filter(col(valueCol).isNotNull)
    // global value-domain bounds; as literals, every job below agrees on
    // bucket membership (physical partition ids would not be stable)
    val bucketCol: Column = bounds.foldLeft(lit(0)) { (acc, b) =>
      acc + when(col(valueCol) > b, 1).otherwise(0)
    }
    val bucketed = projected.withColumn("__bkt", bucketCol)

    val counts = bucketed.groupBy(col(groupCol), col("__bkt")).agg(count(lit(1)).as("__c"))
    // RANK-RESTRICTED selection (optimization r19, guide §2.3): a target
    // rank lands in exactly one bucket's global-rank interval
    // (__off, __off + __c], and row_number within a (group, bucket)
    // window is independent of every other bucket — so only the
    // ≤ 2·|specs| buckets per group that CONTAIN a target rank need to
    // be shuffled and sorted at all. The count table that decides which
    // is groups × numBuckets rows: bounded-small, it collects ONCE and
    // the offsets, per-group totals, target ranks and needed buckets all
    // compute on the driver, returning as two broadcast LOCAL relations
    // — the data then makes exactly TWO passes (the counts aggregation +
    // the needed-bucket ranking) with no duplicated aggregation subtree
    // (a distributed needed-join was measured SLOWER at bench scale:
    // three copies of the counts subtree and two extra AQE stage waves).
    // the fused all-columns counting job supplies this column's cells
    // when its limit provably wasn't hit; otherwise one capped collect
    // per column (the pre-fusion path)
    val cells = precomputedCells.getOrElse(
      counts.limit(MaxDriverCells + 1).collect())
    val (rankedRaw, targets) = if (cells.length <= MaxDriverCells) {
      import org.apache.spark.sql.types._
      import scala.jdk.CollectionConverters._
      val gType = counts.schema(groupCol).dataType
      val byGroup = cells.map(r => (r.get(0), r.getInt(1), r.getLong(2)))
        .groupBy(_._1)
      // per group: bucket-sorted prefix offsets, total n, target ranks
      val neededRows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      val targetRows = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
      byGroup.foreach { case (g, rows) =>
        val sorted = rows.sortBy(_._2)
        var acc = 0L
        val offs = sorted.map { case (_, b, c) => val o = acc; acc += c; (b, o, c) }
        val n = acc
        val ranks = colSpecs.zipWithIndex.flatMap { case ((_, p, _), i) =>
          // bit-for-bit the distributed expression chain: double
          // multiply, floor to long, min against n, frac = r − ⌊r⌋
          val r = p * (n - 1).toDouble
          val lo = math.floor(r).toLong
          targetRows += org.apache.spark.sql.Row(
            g, i, r - lo.toDouble, lo + 1, math.min(lo + 2, n))
          Seq(lo + 1, math.min(lo + 2, n))
        }.toSet
        offs.foreach { case (b, o, c) =>
          if (ranks.exists(r => r > o && r <= o + c))
            neededRows += org.apache.spark.sql.Row(g, b, o)
        }
      }
      val needed = spark.createDataFrame(neededRows.toList.asJava, StructType(Seq(
        StructField(groupCol, gType), StructField("__bkt", IntegerType, false),
        StructField("__off", LongType, false))))
      val targetsLocal = spark.createDataFrame(targetRows.toList.asJava, StructType(Seq(
        StructField("__tgrp", gType), StructField("__spec", IntegerType, false),
        StructField("__frac", DoubleType, false),
        StructField("__lorank", LongType, false),
        StructField("__hirank", LongType, false))))
      (local(bucketed.join(broadcast(needed), Seq(groupCol, "__bkt")),
        localW(groupCol, valueCol)), targetsLocal)
    } else {
      // distributed fallback (the pre-r19 plan): per-group windowed
      // offsets joined back on (group, bucket), every bucket ranked, and
      // target ranks from a distributed per-group count
      val offW = Window.partitionBy(col(groupCol)).orderBy(col("__bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = counts.withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
        .select(col(groupCol), col("__bkt"), col("__off"))
      val ngroups = counts.groupBy(col(groupCol)).agg(sum(col("__c")).as("__n"))
      val targetsDist = colSpecs.zipWithIndex.map { case ((_, p, _), i) =>
        val r = lit(p) * (col("__n") - 1).cast("double")
        val lo = floor(r)
        ngroups.select(
          col(groupCol).as("__tgrp"), lit(i).as("__spec"), (r - lo).as("__frac"),
          (lo.cast("long") + 1).as("__lorank"),
          least(lo.cast("long") + 2, col("__n")).as("__hirank"))
      }.reduce(_ unionAll _)
      (local(bucketed, localW(groupCol, valueCol)).join(offsets, Seq(groupCol, "__bkt")),
        targetsDist)
    }
    val ranked = rankedRaw
      .select(col(groupCol), col(valueCol), (col("__local") + col("__off")).as("__grank"))

    val matched = ranked.join(targets,
        col(groupCol) === col("__tgrp") &&
          (col("__grank") === col("__lorank") || col("__grank") === col("__hirank")))
      .select(col(groupCol), col("__spec"), col("__frac"),
        col("__lorank"), col("__hirank"), col("__grank"), col(valueCol))

    val perSpec = matched.groupBy(col(groupCol), col("__spec"), col("__frac"))
      .agg(
        max(when(col("__grank") === col("__lorank"), col(valueCol))).as("__vlo"),
        max(when(col("__grank") === col("__hirank"), col(valueCol))).as("__vhi"))
      // the symmetric lerp (1−f)·lo + f·hi — bit-for-bit what BOTH
      // Spark's Percentile and DuckDB's QUANTILE_CONT compute (verified
      // on the 6+0.8·1 case, where lo+f·(hi−lo) rounds differently)
      .withColumn("__out",
        (lit(1.0) - col("__frac")) * col("__vlo") + col("__frac") * col("__vhi"))

    perSpec.groupBy(col(groupCol))
      .agg(colSpecs.zipWithIndex.map { case ((_, _, outName), i) =>
        max(when(col("__spec") === i, col("__out"))).as(outName)
      }.head, colSpecs.zipWithIndex.drop(1).map { case ((_, _, outName), i) =>
        max(when(col("__spec") === i, col("__out"))).as(outName)
      }: _*)
  }
}
