package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Count-Min sketch over a key column — the constant-memory frequency
  * summary for streams/corpora whose key space is too large to count
  * exactly (Cormode & Muthukrishnan, "An Improved Data Stream Summary:
  * The Count-Min Sketch and its Applications", J. Algorithms 2005).
  *
  * The sketch is a depth×width counter grid; each key increments one
  * cell per row (depth independent hashes). A point estimate is the MIN
  * over its depth cells — always ≥ the true count, within εN with
  * probability 1−δ for width = e/ε, depth = ln(1/δ).
  *
  * Scale design: building the sketch is ONE map-side-combinable groupBy
  * whose key space is at most depth·width cells (4096 here) — the
  * shuffle moves a bounded number of rows no matter how many input rows
  * or distinct keys exist, which is exactly the property exact counting
  * lacks. Estimation broadcasts the (tiny) sketch table against the
  * probe keys. Sketches of disjoint corpora merge by cell-wise addition
  * (`merge`), so incremental / distributed construction is free.
  *
  * Determinism: the row hashes are md5-derived (first 8 hex chars of
  * md5("<d>|<key>") as an integer, mod width) — a pure function of the
  * key with no JVM-specific seed, so counter values are order-independent
  * integer sums and an independent engine (the DuckDB oracle in
  * q98_countmin_sketch) reproduces every cell and estimate EXACTLY.
  */
object CountMin {

  /** Cell index of `key` for hash row `d`: md5-derived, mod `width`. */
  def cell(key: Column, d: Int, width: Int): Column =
    conv(substring(md5(concat(lit(d.toString), lit("|"), key)), 1, 8), 16, 10)
      .cast("long") % width

  /** Build a depth×width sketch from `rows` on column `key` (one
    * occurrence per row). Returns (d, cell, cnt) — at most depth·width
    * rows; absent cells are zero.
    */
  def sketch(rows: DataFrame, key: String, depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && width >= 1, s"bad sketch dims: $depth x $width")
    val cells = array((0 until depth).map(d => cell(col(key), d, width)): _*)
    rows
      .select(posexplode(cells).as(Seq("d", "cell")))
      .groupBy(col("d"), col("cell"))
      .agg(count(lit(1)).as("cnt"))
  }

  /** Merge two sketches of the same dimensions: cell-wise addition.
    * sketch(A ++ B) == merge(sketch(A), sketch(B)) — the property that
    * makes distributed/incremental construction exact.
    */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.union(b).groupBy(col("d"), col("cell")).agg(sum(col("cnt")).as("cnt"))

  /** Point estimates for `probes` (column `key`): MIN over the depth
    * cells. The sketch is broadcast — it is at most depth·width rows —
    * so probing never shuffles the probe side. A probe key that hits an
    * untouched cell estimates 0 via the left join's null.
    */
  def estimate(sk: DataFrame, probes: DataFrame, key: String,
               depth: Int, width: Int): DataFrame = {
    val cells = array((0 until depth).map(d => cell(col(key), d, width)): _*)
    probes
      .select(col(key), posexplode(cells).as(Seq("d", "cell")))
      .join(broadcast(sk), Seq("d", "cell"), "left")
      .groupBy(col(key))
      .agg(min(coalesce(col("cnt"), lit(0L))).as("cms_est"))
  }
}
