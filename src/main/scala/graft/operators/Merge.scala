package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Lakehouse MERGE (upsert/delete) semantics over plain DataFrames: apply
  * a change batch to a snapshot keyed on `key`.
  *
  * `changes` carries the key, an `op` column ('U' = insert-or-update,
  * 'D' = delete), and the full payload for 'U' rows. The result is
  *   (snapshot ∖ touched keys) ∪ (payloads of 'U' changes)
  * — i.e. UPDATE replaces the whole row, DELETE removes it, INSERT adds it,
  * in one pass. Caller contract: a key appears at most once in the batch
  * (CDC compaction upstream), otherwise both payloads survive.
  *
  * Scale story: this is the CDC-apply step of an incremental lake. The
  * change batch is small relative to the snapshot, so the anti-join
  * broadcasts the batch's KEYS (not payloads) and the snapshot is scanned
  * exactly once with no shuffle; the union appends the 'U' payloads. For a
  * change batch too large to broadcast, the same plan degrades gracefully
  * to a shuffled anti-join on the key — semantics unchanged.
  */
object Merge {

  def upsert(snapshot: DataFrame, changes: DataFrame, key: String): DataFrame = {
    val payloadCols = snapshot.columns
    val keys = changes.select(col(key))
    val kept = snapshot.join(broadcast(keys), Seq(key), "left_anti")
    val upserts = changes.filter(col("op") === "U")
      .select(payloadCols.map(col): _*)
    kept.unionByName(upserts)
  }

  /** CHANGE DATA FEED between two snapshots — the outbound half of CDC
    * (upsert/applyVersioned are the inbound half): diff `prev` → `cur`
    * on `keys` and emit one row per changed key, classified
    * insert / delete / update; unchanged keys emit NOTHING, which is the
    * entire point (downstream consumers process the delta, not the
    * table). The Delta-CDF/Iceberg-changelog read pattern expressed as
    * one relational op.
    *
    * Shape: ONE full-outer join on the key columns with both payloads
    * packed into single structs beforehand — change classification and
    * the unchanged-row filter are then null-safe struct comparisons
    * (`<=>`: a payload column that is NULL on both sides is equal, not
    * unknown — `=!=` would silently drop rows with any null field).
    * At scale this is the standard snapshot-diff: co-partitioned by key
    * hash, no driver state, skew handled by AQE like any other join.
    * Output: keys..., change_type, `old` struct (null for inserts),
    * `new` struct (null for deletes).
    */
  def changeFeed(prev: DataFrame, cur: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "changeFeed needs at least one key column")
    require(prev.columns.sorted.sameElements(cur.columns.sorted),
      s"snapshot schemas differ: ${prev.columns.mkString(",")} vs ${cur.columns.mkString(",")}")
    val payload = cur.columns.filterNot(keys.contains)
    require(payload.nonEmpty, "changeFeed needs at least one non-key column")
    val l = prev.select(keys.map(col) :+ struct(payload.map(col): _*).as("old") : _*)
    val r = cur.select(keys.map(col) :+ struct(payload.map(col): _*).as("new") : _*)
    l.join(r, keys, "full_outer")
      .withColumn("change_type",
        when(col("old").isNull, "insert")
          .when(col("new").isNull, "delete")
          .when(!(col("old") <=> col("new")), "update"))
      .filter(col("change_type").isNotNull)
      .select((keys.map(col) :+ col("change_type") :+ col("old") :+ col("new")): _*)
  }

  // ---- Versioned snapshot table (time travel) --------------------------
  //
  // The minimal lakehouse version layer: a table is a directory of
  // immutable `v<N>` parquet snapshots; every CDC apply writes vN+1 from
  // vN + changes, never mutating history. Readers pick a version (time
  // travel) or the latest. This is the layout the streaming CDC-apply
  // test maintains through foreachBatch — promoted to the operator
  // surface so batch callers share one implementation. Old versions are
  // retention, not garbage: drop them with an explicit vacuum policy.

  import org.apache.spark.sql.SparkSession

  /** Highest COMMITTED version N of `dir` (v0..vN), or -1 if none.
    * Committed = the snapshot dir carries the `_SUCCESS` marker Spark's
    * parquet committer writes after the job completes. A crash mid-write
    * of v(N+1) leaves a partial dir WITHOUT the marker; counting it would
    * make the next apply read the partial snapshot as its base
    * (propagating missing rows into every later version) and would let
    * time travel serve an uncommitted state.
    */
  def latestVersion(spark: SparkSession, dir: String): Long = {
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    if (!fs.exists(p)) -1L
    else fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
      .filter(v => fs.exists(new org.apache.hadoop.fs.Path(s"$dir/v$v/_SUCCESS")))
      .sorted.lastOption.getOrElse(-1L)
  }

  /** Time-travel read: the table exactly as of version `v`. */
  def readVersion(spark: SparkSession, dir: String, v: Long): DataFrame =
    spark.read.parquet(s"$dir/v$v")

  /** Apply one change batch to the latest committed snapshot, committing
    * vN+1. Overwrite mode makes a replayed apply of the same
    * (version, batch) idempotent — the exactly-once story under
    * at-least-once delivery. Pass `expectedVersion` (the base version the
    * caller believes is latest) to make the replay DETERMINISTIC: a retry
    * of apply(base = N) always rewrites v(N+1) from v(N), even if an
    * uncommitted partial v(N+1) is lying around, and fails loudly if the
    * table has meanwhile advanced past N (a concurrent writer — minting
    * v(N+2) from a stale base would silently drop that writer's commit).
    * Returns the new version.
    */
  def applyVersioned(spark: SparkSession, dir: String, changes: DataFrame, key: String,
                     expectedVersion: Long = -1L): Long = {
    val cur = latestVersion(spark, dir)
    require(cur >= 0, s"no v0 snapshot under $dir — seed the table first")
    require(expectedVersion < 0 || cur == expectedVersion,
      s"expected latest v$expectedVersion but found v$cur — concurrent writer or stale replay")
    val next = cur + 1
    upsert(readVersion(spark, dir, cur), changes, key)
      .write.mode("overwrite").parquet(s"$dir/v$next")
    next
  }

  /** Retention: drop all but the newest `keepLast` versions. Never
    * touches the latest snapshot (keepLast is clamped to ≥ 1), deletes
    * strictly oldest-first, and returns the dropped version numbers —
    * the explicit vacuum policy the version layer's docs promise. Time
    * travel to a vacuumed version then fails loudly at read (the dir is
    * gone), never silently serves a different state.
    */
  def vacuum(spark: SparkSession, dir: String, keepLast: Int): Seq[Long] = {
    val latest = latestVersion(spark, dir)
    require(latest >= 0, s"no versions under $dir")
    val cutoff = latest - math.max(1, keepLast) + 1
    val fs = org.apache.hadoop.fs.FileSystem.get(
      new java.net.URI(dir), spark.sparkContext.hadoopConfiguration)
    val p = new org.apache.hadoop.fs.Path(dir)
    val dropped = fs.listStatus(p).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.matches("v\\d+") => n.drop(1).toLong }
      .filter(_ < cutoff).sorted
    dropped.foreach(v => fs.delete(new org.apache.hadoop.fs.Path(s"$dir/v$v"), true))
    dropped
  }
}
