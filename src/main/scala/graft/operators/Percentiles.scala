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
  *      buckets split big groups so no single-task funnel;
  *   4. global in-group rank = local + offset, matched against the target
  *      ranks ⌊p·(n−1)⌋+1 and +2 derived from per-group counts;
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
                        numBuckets: Int = 0): DataFrame = {
    require(specs.nonEmpty, "at least one (valueCol, p, outName) spec required")
    specs.foreach { case (_, p, _) => require(p >= 0.0 && p <= 1.0, s"p out of range: $p") }
    val spark = df.sparkSession
    val n = math.max(1, if (numBuckets > 0) numBuckets
      else spark.conf.get("spark.sql.shuffle.partitions").toInt)
    val byValueCol = specs.groupBy(_._1).toSeq
    val valueCols = byValueCol.map(_._1)
    // ONE approxQuantile pass computes every value column's bucket bounds
    // (the multi-column overload scans the input once), instead of one
    // driver job per distinct value column
    val boundsByCol: Map[String, Array[Double]] =
      if (n == 1) valueCols.map(_ -> Array.empty[Double]).toMap
      else valueCols.zip(df.stat.approxQuantile(valueCols.toArray,
        (1 until n).map(_.toDouble / n).toArray, 0.001)).toMap
    byValueCol.map { case (valueCol, colSpecs) =>
      forOneColumn(df, groupCol, valueCol, colSpecs, boundsByCol(valueCol))
    }.reduce((a, b) => a.join(b, Seq(groupCol)))
  }

  /** True iff the group column folds to a literal (e.g. a caller passed
    * `lit(1).as("g")` to get global percentiles). Checked on the OPTIMIZED
    * plan of a one-column projection so constant propagation through
    * intermediate projects is applied; anything unrecognized conservatively
    * answers false (the grouped path is always correct, just windowed).
    */
  private def groupIsConstant(df: DataFrame, groupCol: String): Boolean =
    df.select(col(groupCol)).queryExecution.optimizedPlan match {
      case p: org.apache.spark.sql.catalyst.plans.logical.Project =>
        p.projectList.forall {
          case a: org.apache.spark.sql.catalyst.expressions.Alias => a.child.foldable
          case e => e.foldable
        }
      case _ => false
    }

  private def forOneColumn(df: DataFrame, groupCol: String, valueCol: String,
                           colSpecs: Seq[(String, Double, String)],
                           bounds: Array[Double]): DataFrame = {
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
    val localW = Window.partitionBy(col(groupCol), col("__bkt")).orderBy(col(valueCol))
    val local = bucketed.withColumn("__local", row_number().over(localW).cast("long"))
    val ranked = (if (groupIsConstant(df, groupCol)) {
      // The group key folds to a literal (q88 passes lit(1)): the per-group
      // cumulative window below would fold to a no-partition global
      // WindowExec ("No Partition Defined" WARN per run). With ONE group
      // the bucket counts are ≤ numBuckets driver rows — the same
      // control-plane class as the approxQuantile bounds — so compute the
      // exclusive prefix sums on the driver and inline them as a literal
      // CASE on __bkt: one window and one join fewer than the grouped path.
      val cRows = counts.select(col("__bkt"), col("__c")).collect()
        .map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
      var acc = 0L
      val offs = cRows.map { case (b, c) => val o = acc; acc += c; (b, o) }
      val offExpr = offs.foldLeft(lit(0L)) { case (e, (b, o)) =>
        when(col("__bkt") === b, lit(o)).otherwise(e)
      }
      local.withColumn("__off", offExpr)
    } else {
      val offW = Window.partitionBy(col(groupCol)).orderBy(col("__bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = counts.withColumn("__off", coalesce(sum(col("__c")).over(offW), lit(0L)))
        .select(col(groupCol), col("__bkt"), col("__off"))
      local.join(offsets, Seq(groupCol, "__bkt"))
    }).select(col(groupCol), col(valueCol), (col("__local") + col("__off")).as("__grank"))

    val ngroups = projected.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    // two target ranks per (group, spec): lo = ⌊p(n−1)⌋+1 and hi = min(lo+1, n).
    // The group column is RENAMED (__tgrp) on this side: both frames derive
    // from the same parent, and a same-attribute equality would make Spark
    // log a "trivially true equals predicate" warning per execution.
    val targets = colSpecs.zipWithIndex.map { case ((_, p, _), i) =>
      val r = lit(p) * (col("__n") - 1).cast("double")
      val lo = floor(r)
      ngroups.select(
        col(groupCol).as("__tgrp"), lit(i).as("__spec"), (r - lo).as("__frac"),
        (lo.cast("long") + 1).as("__lorank"),
        least(lo.cast("long") + 2, col("__n")).as("__hirank"))
    }.reduce(_ unionAll _)

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
