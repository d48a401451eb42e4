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
}
