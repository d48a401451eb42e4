package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-layout control for the lake write path: range-partitioned, sorted
  * parquet. At 100 TB the dominant read cost is scan volume, and the lever
  * is LAYOUT, not the reader: writing each file as a disjoint sorted range
  * of the hot predicate column means (a) parquet row-group min/max stats
  * prune almost every file for point/range predicates, and (b) a
  * subsequent merge/as-of read over the sort key is sequential per file.
  *
  * `repartitionByRange` samples the key distribution (reservoir per
  * partition) so files come out near-equal-sized even under skew — the
  * property a static `partitionBy(hash)` write loses. This composes with
  * the `ref_date=` directory partitioning of the CNPJ lake (coarse time
  * pruning from directories, fine key pruning from row-group stats).
  */
object Layout {

  /** Write `df` as `numFiles` range-partitioned parquet files, each
    * internally sorted by `sortCol`, ranges pairwise disjoint.
    */
  def writeSorted(df: DataFrame, dir: String, sortCol: String, numFiles: Int): Unit =
    df.repartitionByRange(numFiles, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(dir)

  /** Per-file [min, max] of `c` over a parquet directory — the metadata a
    * pruning reader exploits; disjointness of these ranges is the layout
    * invariant `writeSorted` provides (asserted in LayoutSpec).
    */
  def fileRanges(spark: SparkSession, dir: String, c: String): DataFrame =
    spark.read.parquet(dir)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(c)).as("lo"), max(col(c)).as("hi"))

  /** Small-file compaction — the #1 lake-maintenance job behind any
    * incremental ingest (the reference's monthly drops append one file
    * per source zip; a year of runs = hundreds of small objects whose
    * per-file open/footer cost dominates scans at 100 TB). Rewrites a
    * directory into `numFiles` range-partitioned, internally sorted
    * files, restoring BOTH the file-count budget and the disjoint
    * per-file key ranges that make pruning work. Write-audit-publish:
    * the rewrite lands in a sibling `.compact-tmp` dir, is audited
    * (row count in == row count out), and only then atomically swapped —
    * a failed compaction can never eat the table.
    */
  def compact(spark: SparkSession, dir: String, sortCol: String, numFiles: Int): Unit = {
    import org.apache.hadoop.fs.Path
    val tmp = dir.stripSuffix("/") + ".compact-tmp"
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(tmp), spark.sparkContext.hadoopConfiguration)
    val dst = new Path(dir)
    val tmpP = new Path(tmp)
    val oldP = new Path(dir.stripSuffix("/") + ".compact-old")
    // Fail fast on leftovers from a crashed run: with an EXISTING
    // .compact-old, HDFS rename(dst, old) silently moves the table INTO it
    // as a child (rename-into-directory semantics), corrupting the swap.
    // Unknown prior state is an operator decision, not something to guess.
    require(!fs.exists(tmpP) && !fs.exists(oldP),
      s"leftover $tmpP or $oldP from a previous compaction — resolve manually before compacting")
    val src = spark.read.parquet(dir)
    val expected = src.count()
    writeSorted(src, tmp, sortCol, numFiles)
    val actual = spark.read.parquet(tmp).count()
    require(actual == expected,
      s"compaction audit failed: $expected rows in, $actual out — keeping the original")
    // Publish = two renames, EACH checked: FileSystem.rename reports most
    // failures by returning false rather than throwing, and ignoring that
    // here is how a failed swap eats the table.
    def renamed(a: Path, b: Path): Boolean =
      try fs.rename(a, b) catch { case _: java.io.IOException => false }
    if (!renamed(dst, oldP)) {
      fs.delete(tmpP, true)
      throw new java.io.IOException(s"compaction aborted: could not move $dst aside; table untouched")
    }
    if (!renamed(tmpP, dst)) {
      // the backup is now the ONLY copy — restore it before failing
      if (!renamed(oldP, dst))
        throw new java.io.IOException(
          s"compaction publish AND rollback failed: table data is intact at $oldP — restore manually")
      fs.delete(tmpP, true)
      throw new java.io.IOException(s"compaction publish failed; original restored at $dst")
    }
    // drop the backup only after the published dir verifiably reads back
    val published = try spark.read.parquet(dir).count() catch { case _: Throwable => -1L }
    if (published != expected)
      throw new java.io.IOException(
        s"published $dst reads $published rows, expected $expected — backup kept at $oldP")
    fs.delete(oldP, true)
  }

  // ---- Z-order (Morton) clustering -------------------------------------

  /** Interleave zeros into the low 16 bits (x15 x14 … x0 →
    * x15 0 x14 0 … x0): the classic magic-mask spread, expressed in
    * codegen'd builtin column ops (no UDF).
    */
  private def spreadBits16(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val a = c.cast("long").bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** 32-bit Morton key of two 16-bit coordinates: `x`'s bits at even
    * positions, `y`'s at odd — monotone in NEITHER input alone, which is
    * the point: z-proximate rows are close in both dimensions. Public
    * because it is replayable arithmetic, not just a write-path detail:
    * q134's gate row recomputes it in the DuckDB oracle bit-for-bit.
    * Inputs beyond 16 bits are masked; range-reduce upstream.
    */
  def mortonKey(x: org.apache.spark.sql.Column,
                y: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    spreadBits16(x).bitwiseOR(shiftleft(spreadBits16(y), 1))

  /** Write `df` as `numFiles` parquet files clustered on the Z-ORDER
    * (Morton) curve over TWO numeric columns. A 1-D sort gives perfect
    * pruning on its sort column and NONE on any other; the Z-curve trades
    * a little of the first column's locality for locality in BOTH — a
    * predicate on either column (or a 2-D box) skips most files via the
    * same per-file min/max stats.
    *
    * Scale shape: one tiny bounds aggregate (min/max of both columns, a
    * driver scalar), then the same repartitionByRange+sort pipeline as
    * `writeSorted` keyed on the interleaved 32-bit z-value. Linear
    * min/max normalization to 16 bits per dimension — rank-normalize
    * upstream if a dimension is pathologically skewed.
    */
  def writeZOrdered(df: DataFrame, dir: String, c1: String, c2: String,
                    numFiles: Int): Unit = {
    val b = df.agg(
      min(col(c1)).cast("double"), max(col(c1)).cast("double"),
      min(col(c2)).cast("double"), max(col(c2)).cast("double")).head()
    def norm(c: String, lo: Double, hi: Double) = {
      val span = if (hi > lo) hi - lo else 1.0
      least(floor((col(c).cast("double") - lit(lo)) / lit(span) * 65536.0), lit(65535.0))
        .cast("long")
    }
    val z = mortonKey(norm(c1, b.getDouble(0), b.getDouble(1)),
      norm(c2, b.getDouble(2), b.getDouble(3)))
    df.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(dir)
  }
}
