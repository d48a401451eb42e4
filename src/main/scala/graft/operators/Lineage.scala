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
}
