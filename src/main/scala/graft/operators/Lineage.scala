package graft.operators

import org.apache.spark.sql.DataFrame

/** Lineage cutting for iterative DataFrame loops (BFS, connected
  * components, PageRank): resets both the PHYSICAL and the LOGICAL plan
  * to a leaf so per-round Catalyst planning stays O(1) — see NOTES
  * ("Iterative loops: cut the LOGICAL lineage") for the measured cost
  * of using persist() instead.
  *
  * Two modes, chosen per SESSION at runtime:
  *
  *   - default: `localCheckpoint` — blocks live on executors; fastest,
  *     and right for single-JVM/local runs, but an executor loss
  *     mid-loop loses blocks and fails the job;
  *   - `spark.graft.checkpoint.reliable = true` (+ a configured
  *     `SparkContext.setCheckpointDir`): RELIABLE `checkpoint` — round
  *     state is written to the checkpoint directory (HDFS/object
  *     store on a cluster), so a lost executor recovers from storage
  *     instead of failing a 100-round job. The documented price is the
  *     standard one: the checkpoint write recomputes the (small,
  *     per-round label/frontier) frame once more per round.
  *
  * Lazy in both modes — the caller's next action materializes the cut.
  *
  * LIFECYCLE: a cut frame's truth lives in checkpoint blocks that
  * `DataFrame.unpersist()` cannot reach (the plan is a LogicalRDD leaf;
  * unpersist only consults the cache manager). [[release]] frees them
  * explicitly; the iterative operators (Bfs, PageRank, Dedup CC) release
  * each SUPERSEDED round eagerly once its successor is materialized, so
  * a loop holds at most two rounds of block storage — and their RESULT
  * is itself one cut leaf the caller frees with `Lineage.release(result)`
  * when done (the query layer's clearCaches does exactly this).
  */
object Lineage {

  val ReliableConf = "spark.graft.checkpoint.reliable"

  def cut(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    // unparsable values fail LOUDLY: silently falling back to the
    // non-durable mode would hand the operator exactly the
    // executor-loss failure the flag was set to survive
    val reliable = spark.conf.get(ReliableConf, "false").trim.toLowerCase match {
      case "true"  => true
      case "false" => false
      case other => throw new IllegalArgumentException(
        s"$ReliableConf must be 'true' or 'false', got '$other'")
    }
    if (reliable) {
      require(spark.sparkContext.getCheckpointDir.isDefined,
        s"$ReliableConf=true requires SparkContext.setCheckpointDir(...) — " +
          "reliable round state needs a durable directory")
      df.checkpoint(false)
    } else df.localCheckpoint(false)
  }

  /** Free the checkpoint blocks behind a [[cut]] frame NOW, instead of
    * waiting for the ContextCleaner to notice the frame was
    * garbage-collected. Walks the logical plan for LogicalRDD leaves and
    * unpersists their RDDs (also dropping any cache-manager entry on the
    * frame itself first, so a persisted-over-cut frame releases fully).
    *
    * After release the frame is DEAD: local-checkpoint blocks are the
    * only copy of its data, so any later action on it (or on a plan
    * built over it that was not itself materialized) fails with a
    * missing-block error. Reliable-mode cuts are unaffected — their
    * truth is the checkpoint FILES, which this does not delete.
    */
  def release(df: DataFrame): Unit = {
    df.unpersist(blocking = false)
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD =>
        l.rdd.unpersist(blocking = false)
      case _ => ()
    }
  }
}
