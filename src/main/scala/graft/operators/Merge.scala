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
}
