package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core extraction by parallel peeling: repeatedly delete EVERY node
  * whose degree in the remaining subgraph is < k, until none is — the
  * fixpoint is the maximal subgraph with all degrees ≥ k (the k-core),
  * independent of peel order, which is why the synchronous
  * delete-all-at-once rounds below compute the same answer as any
  * sequential peel.
  *
  * The dense-community primitive of the graph family (vs reachability —
  * [[Bfs]]/[[Sssp]] — and global structure — [[PageRank]], CC): spam
  * rings, boilerplate hubs and scraped-mirror clusters in a link/co-dup
  * graph live in high-k cores.
  *
  * Scale shape per round: ONE map-side-combined degree count (the hot
  * hub's edges partially aggregate per map partition — no hub key ever
  * concentrates in a reduce task, same defense DedupSpec's star test
  * pins for CC) + TWO anti-joins against the `bad` node set, which is
  * small after the first round and broadcast by AQE. Only (src, dst)
  * pairs flow between rounds. Parallel peeling depth is the graph's
  * degeneracy ordering depth — O(V) worst case on a bare path, but a
  * handful of rounds on any graph with a real core (`maxIters` guards
  * the pathological case and the operator THROWS rather than return a
  * half-peeled subgraph).
  *
  * Per-round frames are [[Lineage.cut]] (localCheckpoint) and released
  * eagerly — the loop holds ≤ 2 rounds of blocks; the result is one
  * checkpoint leaf the caller must free with [[Lineage.release]]
  * (unpersist cannot reach a LogicalRDD leaf).
  */
object KCore {

  /** Nodes of the k-core of the UNDIRECTED graph given as a
    * both-directions edge list (pass [[PageRank.bothWays]] output),
    * with each node's degree inside the core: (node, deg), deg ≥ k.
    * Empty result when no k-core exists.
    */
  def kCore(el: DataFrame, k: Int, maxIters: Int = 50): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    // (u, v) both-ways convention shared with Bfs/Sssp/PageRank
    var edges = Lineage.cut(el.select(col("u").as("src"), col("v").as("dst")))
    var prev: DataFrame = null // superseded round, release deferred below
    var converged = false
    var iter = 0
    while (!converged && iter < maxIters) {
      // ONE action per round. Its job-end doCheckpoint also materializes
      // the CURRENT cut's blocks — which is why the release below is
      // deferred one round: a cut frame is lazy until a job touches it,
      // so freeing its predecessor before that job loses the blocks the
      // lazy plan still reads (the Bfs release-deferred-a-round rule).
      val bad = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
        .filter(col("deg") < k).select(col("src").as("bad"))
      if (bad.isEmpty) converged = true
      else {
        val next = Lineage.cut(edges
          .join(bad.withColumnRenamed("bad", "src"), Seq("src"), "left_anti")
          .join(bad.withColumnRenamed("bad", "dst"), Seq("dst"), "left_anti")
          .select(col("src"), col("dst")))
        if (prev != null) Lineage.release(prev)
        prev = edges
        edges = next
      }
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"kCore(k=$k) did not converge in $maxIters peel rounds — raise maxIters; " +
          "returning a partially peeled subgraph would overstate the core")
    val result = Lineage.cut(
      edges.groupBy(col("src").as("node")).agg(count(lit(1)).as("deg")))
    result.count() // materialize the leaf BEFORE freeing what it reads
    if (prev != null) Lineage.release(prev)
    Lineage.release(edges)
    result
  }
}
