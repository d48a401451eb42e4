package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Deterministic mergeable quantile summary — the approximate-quantiles
  * member of the sketch family (frequency: CountMin / SpaceSaving,
  * distinct: HLL / bitmap, membership: bloom): per partition, the sorted
  * values at m equi-spaced rank positions, each carrying its EXACT local
  * rank (count of elements <= it). Classic partition-wise quantile
  * merging (the mergeable-summaries framing of Agarwal et al., PODS
  * 2012): for any value v, summing per-partition lower-bound ranks
  * estimates its global rank with error < Σ_p ceil(n_p / m) — at most
  * P + n/m — because within each partition the true rank sits between
  * one sample's exact rank and the next sample's position.
  *
  * Unlike GK/KLL this summary has no per-row update path (it sorts each
  * partition once), but in exchange it is fully DETERMINISTIC given the
  * partition layout — a pure function of each partition's value multiset,
  * insensitive to row order — which is what makes its guarantees
  * spec-pinnable and its behavior reproducible across reruns. State is
  * O(m) per partition; the merge is one bounded relational pass over
  * m·P summary rows; nothing unbounded ever reaches the driver.
  *
  * The exact-percentile operator ([[Percentiles]]) remains the path when
  * exactness is required; this is the constant-state path when it isn't
  * (100 TB profiling scans, optimizer statistics, monitoring).
  */
object QuantileSummary {

  /** Per-partition summary of `rows`' numeric column `keyCol` (cast to
    * long): (v, cnt_le, np, pid) — sampled value, its exact local rank
    * (# elements <= v in the partition), the partition's row count, and
    * the partition id. Emits min(m, np) rows per non-empty partition.
    */
  def summarize(rows: DataFrame, keyCol: String, m: Int): DataFrame = {
    require(m >= 1, s"summary size must be >= 1, got $m")
    val s = rows.sparkSession
    import s.implicits._
    val ds: Dataset[Long] = rows.select(col(keyCol).cast("long")).as[Long]
    ds.mapPartitions { it =>
      val arr = it.toArray
      java.util.Arrays.sort(arr)
      val np = arr.length
      if (np == 0) Iterator.empty
      else {
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // count of elements <= v, exact (binary search for the upper bound)
        def cntLe(v: Long): Long = {
          var lo = 0; var hi = np
          while (lo < hi) {
            val mid = (lo + hi) >>> 1
            if (arr(mid) <= v) lo = mid + 1 else hi = mid
          }
          lo.toLong
        }
        (1 to m).iterator
          .map(j => ((j.toLong * np + m - 1) / m).toInt) // position ceil(j*np/m), 1-based
          .distinct
          .map(p => (arr(p - 1), cntLe(arr(p - 1)), np.toLong, pid))
      }
    }.toDF("v", "cnt_le", "np", "pid")
  }

  /** Estimated global rank (count of elements <= v) for every sampled
    * value: Σ over partitions of the largest exact local rank among that
    * partition's samples <= v. A lower bound on the true rank, within
    * Σ_p ceil(n_p/m) of it. One bounded join over the m·P summary rows.
    */
  def candidateRanks(summary: DataFrame): DataFrame = {
    val s = summary.sparkSession
    import s.implicits._
    val cands = summary.select($"v".as("c")).distinct()
    cands.join(summary, $"v" <= $"c")
      .groupBy($"c", $"pid").agg(max($"cnt_le").as("rp"))
      .groupBy($"c").agg(sum($"rp").as("est_rank"))
  }

  /** Approximate PERCENTILE_DISC at each requested permille (integer
    * thousandths — exact integer target ranks, rule 14): the SMALLEST
    * sampled value whose estimated rank reaches ceil(q·n/1000) — the
    * same cumdist >= p convention as q107, so at full capacity (m >=
    * every partition's rows) the answer IS exact PERCENTILE_DISC. A pick
    * always exists: the global max is sampled by every partition (j=m
    * lands on position n_p), so its estimate is exactly n. The picked
    * value's true rank lies within 2·Σ_p ceil(n_p/m) of the target
    * (estimate error + successive-candidate rank gap, each <= the sum).
    * Returns (permille, value, est_rank, n).
    */
  def quantiles(summary: DataFrame, permille: Seq[Int]): DataFrame = {
    require(permille.nonEmpty && permille.forall(q => q >= 1 && q <= 1000))
    val s = summary.sparkSession
    import s.implicits._
    val n = summary.select($"pid", $"np").distinct()
      .agg(coalesce(sum($"np"), lit(0L)).as("n"))
    val targets = permille.toDF("permille")
      .crossJoin(broadcast(n))
      .withColumn("target", expr("(permille * n + 999) div 1000"))
    val byValue = Window.partitionBy($"permille").orderBy($"c".asc)
    candidateRanks(summary)
      .crossJoin(broadcast(targets))
      .filter($"est_rank" >= $"target")
      .withColumn("rn", row_number().over(byValue))
      .filter($"rn" === 1)
      .select($"permille".cast("long").as("permille"), $"c".as("value"),
        $"est_rank", $"n")
      .orderBy($"permille")
  }
}
