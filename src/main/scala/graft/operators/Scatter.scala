package graft.operators

import org.apache.spark.sql.{Column, DataFrame}

/** Parallelism placement for per-row-HEAVY scalar pipelines over narrow
  * scans (optimization guide §2.5 "input skew: one huge unsplittable
  * file ... repartition immediately after the read", §8 "decide where
  * the heavy work runs relative to the exchanges you already have").
  *
  * The problem this solves: a parquet scan parallelizes at ROW-GROUP
  * granularity. A table written as one file with one row group (the
  * committed testdata shape — and, in production, any unsplittable or
  * few-row-group input: a giant gzip, a single fat upstream file) scans
  * as ONE task, so every expression in the scan-stage projection — regex
  * chains, BigDecimal rounding, try_cast exception handling, FFTs —
  * runs on one core while the rest of the cluster idles. The engine's
  * deterministic-ORDER-BY contract means nearly every such pipeline
  * already ends in a range exchange (orderBy = range-partition + local
  * sort): the fix is to run that SAME exchange BEFORE the heavy
  * projection instead of after it, which moves the per-row work to the
  * post-shuffle side where parallelism is chosen by the partitioner,
  * not by the input file layout.
  *
  *   before:  Scan(1 task: heavy exprs) → Exchange(range) → Sort
  *   after:   Scan(1 task: column prune only) → Exchange(range)
  *            → heavy exprs + Sort  (n tasks)
  *
  * Exchange COUNT is unchanged (the orderBy's own exchange is reused),
  * and the exchanged bytes are the pruned input columns rather than the
  * computed output — at cluster scale this is the identical plan shape
  * an orderBy produces today, with the projection placed one operator
  * later; locally it is the difference between 1 core and all of them.
  *
  * Partition count: `n = max(defaultParallelism, shuffle.partitions,
  * inputBytes / advisoryPartitionSizeInBytes)` — the floor keeps a
  * CPU-bound stage wide even when the bytes are tiny (AQE's
  * byte-targeted coalescing would otherwise re-serialize it: 5 MB of
  * text carrying 2 s of regex work per MB is a CPU problem, not a bytes
  * problem, which is why the repartition pins an explicit N that AQE
  * must respect), and the bytes term grows the count on genuinely large
  * inputs exactly like a plain orderBy's shuffle would. Nothing here is
  * keyed to local mode: every term is a cluster conf or derived from
  * the input's own planned size.
  *
  * Results are IDENTICAL by construction: range-partition + per-
  * partition sort on the same keys IS the distributed execution of
  * ORDER BY (disjoint ordered ranges, partitions in range order), and
  * projections commute with repartitioning row-for-row.
  */
object Scatter {

  /** Input-size-derived partition count for a CPU-heavy stage over
    * `df`'s rows: wide enough for every core at any input size, growing
    * with planned input bytes at the cluster's advisory partition size.
    */
  def parallelism(df: DataFrame): Int = {
    val spark = df.sparkSession
    val advisory = org.apache.spark.sql.internal.SQLConf.get.getConf(
      org.apache.spark.sql.internal.SQLConf.ADVISORY_PARTITION_SIZE_IN_BYTES)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val byBytes =
      if (advisory <= 0) BigInt(1) else (bytes + advisory - 1) / advisory
    // Catalyst's size estimate is reliable for scan-rooted frames (file
    // bytes) but joins MULTIPLY estimates — cap the bytes term at 8×
    // the cluster width so a wild join estimate can only widen the
    // stage, never explode the partition count (a raw cap of 2^20 let a
    // self-join estimate request six-figure partition counts)
    val capped = byBytes.min(BigInt(8L * cores(spark))).toInt.max(1)
    math.max(cores(spark), capped)
  }

  /** The cluster-width floor alone — for sizing a persisted artifact or
    * any frame whose logical size estimate is untrustworthy (join- or
    * aggregate-rooted lineage).
    */
  def cores(spark: org.apache.spark.sql.SparkSession): Int =
    math.max(spark.sparkContext.defaultParallelism,
      spark.conf.get("spark.sql.shuffle.partitions").toInt)

  /** `heavy(df ordered-scattered on sortCols)` sorted within partitions:
    * the drop-in replacement for `heavy(df).orderBy(sortCols)` when
    * `heavy` is an expensive per-row projection — same global order,
    * same exchange count, heavy work on the parallel side. `sortCols`
    * must exist on `df` (the pre-projection frame) and be untouched by
    * `heavy` (true for every ORDER-BY-on-key query in the registry).
    */
  def ordered(df: DataFrame, sortCols: Seq[Column])
             (heavy: DataFrame => DataFrame): DataFrame =
    ordered(df, sortCols, sortCols)(heavy)

  /** As above, with the output sorted on MORE keys than the scatter
    * (e.g. heavy() fans each row out to (doc_id, frame_idx) rows):
    * `scatterCols` must be a prefix of `outSortCols` and survive
    * `heavy` row-wise — range partitions are then contiguous under the
    * full output order and the per-partition sort yields the identical
    * global order an orderBy(outSortCols) would.
    */
  def ordered(df: DataFrame, scatterCols: Seq[Column], outSortCols: Seq[Column])
             (heavy: DataFrame => DataFrame): DataFrame =
    heavy(df.repartitionByRange(parallelism(df), scatterCols: _*))
      .sortWithinPartitions(outSortCols: _*)

  /** Even scatter for a CPU-heavy stage whose result is then REDUCED
    * (aggregation / map-side-combining consumer) rather than emitted
    * per row: when the scan already plans at least `parallelism(df)`
    * input splits this is the IDENTITY (no exchange is added at scale —
    * the 100 TB plan is unchanged); only a scan narrower than the
    * cluster (the unsplittable-input case) pays one exchange of the
    * pruned input columns to buy back every core. The exchange hashes a
    * DETERMINISTIC xxhash64 of `spreadCols` (which must near-uniquely
    * identify rows — a doc id, a table key): unlike round-robin
    * `repartition(n)`, this pays neither the retry-safety local sort
    * (SPARK-23207) nor a range-sampling pass, and retried tasks
    * reproduce the same row placement by construction (guide §2.5).
    *
    * ONLY worth it when the per-row work downstream clearly outweighs a
    * per-row shuffle write+read. Measured r19: heavy scalar chains
    * (regex, tokenizers, try_cast, BigDecimal rounding/grouping-set
    * partial aggregation — the q01/q29/q63/q145 family) 2-3× faster;
    * but a chain whose output is immediately map-side-combined off a
    * CHEAP projection loses (the pre-explode text shuffle on
    * q137/q188/q189 shipped the full payload to buy back single-task
    * tokenization — reverted, see TextQueries notes).
    *
    * The exchange hashes `spreadCols` DIRECTLY (plain `repartition(n,
    * cols)` = HashPartitioning(cols)), not an xxhash64 wrapper (r19):
    * murmur3 on near-unique ids spreads just as uniformly, is equally
    * deterministic under retries, and — decisively — leaves an output
    * partitioning that downstream joins/aggregations KEYED ON THE SAME
    * COLUMNS can reuse (guide §2.4). The manifest family joins its
    * per-doc signal legs on doc_id right after the scatter; wrapping the
    * key in xxhash64 forced every one of those joins to re-exchange.
    */
  def even(df: DataFrame, spreadCols: Seq[Column]): DataFrame = {
    val target = parallelism(df)
    val planned = df.rdd.getNumPartitions
    if (planned >= target) df
    else df.repartition(target, spreadCols: _*)
  }
}
