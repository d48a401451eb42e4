package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Space-Saving — the capacity-bounded top-k frequency summary (Metwally,
  * Agrawal, El Abbadi, "Efficient Computation of Frequent and Top-k
  * Elements in Data Streams", ICDT 2005) in its MERGEABLE form (Agarwal
  * et al., "Mergeable Summaries", PODS 2012).
  *
  * This is the operator q84's exact heavy hitters defers to when the key
  * space is unbounded: the exact per-partition hash map becomes a
  * capacity-k counter set — when a new key arrives at a full summary, the
  * minimum-count entry is evicted and the newcomer inherits its count as
  * overestimation error. Per-partition state is O(k) regardless of
  * stream length or cardinality.
  *
  * Each partition also reports its eviction floor m_p (the min count in
  * its full summary; 0 if it never overflowed): a key ABSENT from
  * partition p's summary has local count ≤ m_p. Merging the P summaries
  * relationally (one groupBy over ≤ k·P + P rows) yields per-key bounds
  *
  *   lb(key) = Σ_present (est_p − err_p)           ≤ true count
  *   ub(key) = Σ_present est_p + Σ_absent m_p      ≥ true count
  *
  * and the containment guarantee: any key with true count > Σ_p m_p is
  * in at least one summary (its absence everywhere would bound its count
  * by Σ m_p) — so with k sized to the target threshold, no true heavy
  * hitter can be missed. Eviction ties break on the lexicographically
  * smallest key, so the summary is a pure function of each partition's
  * row sequence.
  */
object SpaceSaving {

  /** Per-key (lb, ub) count bounds from capacity-`k` per-partition
    * summaries of `rows`' string column `keyCol`. Returns
    * (key, lb, ub, floor_total) where floor_total = Σ_p m_p is the
    * global containment threshold (identical on every row). Candidates
    * are exactly the keys surviving in ≥1 partition summary.
    */
  def summarize(rows: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, s"capacity must be >= 1, got $k")
    val s = rows.sparkSession
    import s.implicits._
    val ds: Dataset[String] = rows.select(col(keyCol).cast("string")).as[String]
    // (key, est, err, mp, isMarker): entries carry the local SS state
    // plus their partition's eviction floor m_p (needed to compute
    // Σ_absent m_p = floor_total − Σ_present m_p at merge time); one
    // marker row per partition carries m_p alone
    val local = ds.mapPartitions { it =>
      val counts = scala.collection.mutable.HashMap.empty[String, (Long, Long)]
      var overflowed = false
      it.foreach { key =>
        counts.get(key) match {
          case Some((est, err)) => counts.update(key, (est + 1L, err))
          case None if counts.size < k => counts.update(key, (1L, 0L))
          case None =>
            overflowed = true
            // evict the min-est entry (lexicographic tie-break), inherit
            // its count as the newcomer's overestimation error
            val (victim, (m, _)) =
              counts.minBy { case (kk, (est, _)) => (est, kk) }
            counts.remove(victim)
            counts.update(key, (m + 1L, m))
        }
      }
      val mP =
        if (!overflowed) 0L
        else counts.valuesIterator.map(_._1).min
      Iterator.single(("", 0L, 0L, mP, true)) ++
        counts.iterator.map { case (kk, (est, err)) => (kk, est, err, mP, false) }
    }.toDF("key", "est", "err", "mp", "marker")

    val floorTotal = local.filter($"marker")
      .agg(coalesce(sum($"mp"), lit(0L)).as("floor_total"))
    local.filter(!$"marker")
      .groupBy($"key")
      .agg(
        sum($"est" - $"err").as("lb"),
        sum($"est").as("present_est"),
        sum($"mp").as("mp_present"))
      .crossJoin(broadcast(floorTotal))
      .select($"key", $"lb",
        ($"present_est" + $"floor_total" - $"mp_present").as("ub"),
        $"floor_total")
  }
}
