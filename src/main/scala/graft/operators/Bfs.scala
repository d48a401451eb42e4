package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Breadth-first search: minimum hop distance from a source node over a
  * directed edge list (pass [[PageRank.bothWays]] output for undirected
  * graphs). The frontier-expansion loop is Pregel's BFS expressed as
  * relational ops — per level ONE equi-join (frontier → edges), one
  * distinct, and one anti-join against the visited set:
  *
  *   frontier_{k+1} = distinct(neighbors(frontier_k)) ∖ visited
  *
  * Scale design: only (node) and (node, lvl) vectors flow between
  * rounds — the edge table is a read-only join side, never rewritten.
  * The anti-join keeps every node's FIRST discovery only, so each node
  * is expanded exactly once and total work is O(|E|) across all levels,
  * the textbook BFS bound. Each level's frontier is persisted and its
  * predecessor released, so lineage stays one round deep instead of
  * accumulating a level-deep plan (the classic iterative-DataFrame
  * trap). Levels are small integers and node ids flow unchanged — no
  * arithmetic at all — so results are trivially engine-independent
  * (q96's DuckDB oracle re-derives the same levels with a capped
  * recursive CTE).
  */
object Bfs {

  /** (node, lvl) minimum hop distances for every node within `maxDepth`
    * hops of `source` (source itself at lvl 0). Unreached nodes are
    * absent. The returned frame is persisted — caller unpersists.
    */
  def levels(el: DataFrame, source: Long, maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, s"maxDepth must be >= 0, got $maxDepth")
    val spark = el.sparkSession
    var dist = spark.range(1)
      .select(lit(source).cast("long").as("node"), lit(0).as("lvl"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    var frontier = dist.select(col("node"))
    var prevDist: DataFrame = null
    var prevFrontier: DataFrame = null
    var lvl = 0
    var frontierSize = 1L
    while (lvl < maxDepth && frontierSize > 0) {
      lvl += 1
      // explicit aliases: the frontier's lineage already contains the
      // edge attributes (it was derived from `el` last round), so an
      // unqualified join would be an ambiguous self-join
      val next = frontier.as("f")
        .join(el.as("e"), col("f.node") === col("e.u"))
        .select(col("e.v").as("node")).distinct()
        .join(dist.select(col("node")), Seq("node"), "left_anti")
        .persist(StorageLevel.MEMORY_AND_DISK)
      // the ONLY action per level: materializes `next` and — via the
      // anti-join's scan of `dist` — populates the current distance
      // vector's cache, so the PREVIOUS round's inputs can be released
      // now (releasing them eagerly would force an uncached lineage
      // walk; releasing dist itself would re-run the whole chain). One
      // O(V) pass per level, not two: the old per-level `grown.count()`
      // re-scanned the growing vector purely to allow an eager release.
      frontierSize = next.count()
      if (prevDist != null) prevDist.unpersist()
      if (prevFrontier != null) prevFrontier.unpersist()
      val grown = dist.union(next.withColumn("lvl", lit(lvl)))
        .persist(StorageLevel.MEMORY_AND_DISK)
      prevDist = dist
      dist = grown
      prevFrontier = next
      frontier = next
    }
    // materialize the final vector before releasing the cached frames it
    // unions over, then hand it to the caller one round deep
    dist.count()
    if (prevDist != null) prevDist.unpersist()
    if (prevFrontier != null) prevFrontier.unpersist()
    dist
  }
}
