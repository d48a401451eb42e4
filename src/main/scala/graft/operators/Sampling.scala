package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Weighted sampling with DETERMINISTIC integer priorities — the curation
  * operator for mixing corpora by a quality/length weight ("sample 10k
  * docs per language, proportional to quality") that must be reproducible
  * across runs, engines, and partitionings.
  *
  * The A-ES weighted-reservoir family draws key U^(1/w) per item and keeps
  * the top-k; anything built on an RNG or on float keys is neither
  * replayable nor cross-engine stable. This variant keeps the
  * weight-biased-rank idea but makes the key a pure INTEGER function of
  * the id:
  *
  *   x        = (id + seed) mod M                  (M = 2^31−1, prime)
  *   h(id)    = (x·x mod M) * A mod M              (A = 48271)
  *   priority = (h(id) * 10^6) div weight
  *
  * and keeps the k SMALLEST priorities per group (ties broken by id).
  * The SQUARE is load-bearing: a purely affine mixer (Lehmer alone) turns
  * an additive seed into a constant shift of every hash — same ordering,
  * same sample for every seed. Squaring makes the seed interact with the
  * id (2·id·seed cross-term), so each seed draws a fresh ordering, while
  * h stays a pure function: re-running, repartitioning, or replaying in
  * another engine selects the same rows. Doubling an item's weight halves
  * its expected priority — heavier items win proportionally more often
  * across seeds (pinned in SamplingSpec).
  *
  * The widest intermediate is x² < M² ≈ 2^62, inside signed-64 range, so
  * engines that ERROR on BIGINT overflow rather than wrap (DuckDB)
  * compute the identical value — the q90 oracle runs this formula
  * verbatim in SQL.
  *
  * Scale shape: one window shuffle on the group key; the priority is a
  * codegen'd per-row expression. For k ≪ group size, a per-partition
  * top-k pre-prune (rank within partition ≤ k) can bound the shuffle —
  * not needed until group cardinalities are extreme.
  */
object Sampling {

  /** Park–Miller modulus (prime) and multiplier. */
  val M = 2147483647L
  val A = 48271L
  private val Scale = 1000000L

  /** The deterministic priority as a SQL expression over the two column
    * names — `div` is integer division, `weight` is clamped to ≥ 1 so a
    * zero/negative weight degrades to uniform instead of dividing by zero.
    * The identical text (with DuckDB's `//` for `div`) is the oracle side.
    */
  def prioritySql(idCol: String, weightCol: String, seed: Long): String =
    s"(((($idCol + $seed) % $M) * (($idCol + $seed) % $M)) % $M * $A % $M * $Scale)" +
      s" div greatest($weightCol, 1)"

  def priority(idCol: String, weightCol: String, seed: Long): Column =
    expr(prioritySql(idCol, weightCol, seed))

  /** Keep the k smallest-priority rows per group. Output = input columns
    * plus the integer `__priority` (callers project/rename as needed).
    */
  def weightedSamplePerGroup(df: DataFrame, groupCol: String, idCol: String,
                             weightCol: String, k: Int, seed: Long): DataFrame = {
    require(k > 0, s"k must be positive: $k")
    val w = Window.partitionBy(col(groupCol)).orderBy(col("__priority"), col(idCol))
    df.withColumn("__priority", priority(idCol, weightCol, seed))
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** TOKEN-BUDGET sampling per group — the actual CCNet/Gopher mixing
    * step the per-row-count [[weightedSamplePerGroup]] approximates: a
    * pretraining mix allocates each (language, quality-bucket) cell a
    * budget of TOKENS, not documents (doc lengths vary by orders of
    * magnitude, so a row count k is the wrong unit). Within each group,
    * documents are taken in deterministic integer-priority order (the
    * same mid-square mixer — never an RNG, so the mix replays
    * bit-for-bit across runs, engines, and partitionings) until the
    * group's budget is reached; the document that CROSSES the line is
    * included, so realized tokens exceed the budget by strictly less
    * than one document (the published sample-to-token-budget contract —
    * a budget in tokens cannot be hit exactly at document granularity).
    *
    * `budgetCol` is a per-row column carrying the group's token budget
    * (join a |groups|-row broadcast table or a CASE over the bucket —
    * both are map-side). The running sum is the GROUPED two-phase
    * prefix sum ([[Packing.groupedExclusivePrefixSum]]), never a
    * per-group sort window — English is half of any real crawl, and a
    * window partitioned by language funnels it through one task.
    *
    * Output: input columns plus `priority` and `tokens_before` (the
    * audit pair: the oracle replays the priority formula and the
    * running-sum cutoff verbatim, and `tokens_before < budget` IS the
    * keep rule).
    */
  def sampleToTokenBudget(df: DataFrame, groupCols: Seq[String],
                          idCol: String, tokenCol: String,
                          budgetCol: String, seed: Long,
                          weightCol: Option[String] = None): DataFrame = {
    val pr = weightCol.map(wc => priority(idCol, wc, seed))
      .getOrElse(expr(prioritySql(idCol, "1", seed)))
    // Unweighted priorities are h(id) * Scale with h uniform on [0, M):
    // the prefix sum's range buckets come from literal evenly spaced
    // boundaries (Packing.uniformBounds) instead of an approxQuantile
    // job — same result under any contiguous split, one driver action
    // fewer per mix. Weighted priorities divide by the weight and are
    // no longer uniform; those keep the quantile sketch.
    val range = if (weightCol.isEmpty) Some((0L, (M - 1) * Scale)) else None
    Packing.groupedExclusivePrefixSum(
        df.withColumn("priority", pr),
        groupCols, "priority", idCol, tokenCol, "tokens_before",
        uniformRange = range,
        // tokenCol is a stored column of the caller's (usually memoized)
        // frame, not a computed chain — no snapshot on the uniform path
        materialize = false)
      .filter(col("tokens_before") < col(budgetCol))
  }

  // ---- the PERSISTED mixing allocation (the ArtifactStore leg) -------
  // A pretraining mix is an offline decision artifact exactly like the
  // CCNet pair: the per-cell token budgets, the selection seed, and the
  // TOKENIZER identity (the budgets are denominated in tokens of one
  // specific tokenizer — re-counting with a different merges table
  // silently shifts every running sum) must replay together across
  // sessions and streams, or two jobs "running the same mix" select
  // different documents.

  final case class Allocation(cells: DataFrame, groupCols: Seq[String],
                              budgetCol: String, seed: Long, tok: Long)

  private val AllocationFormat = "graft-mix-allocation"
  private val AllocationVersion = 1

  /** Persist an allocation: the |cells|-row (group cols, budget) table
    * plus seed and tokenizer fingerprint as manifest scalars, manifest
    * written LAST (the [[ArtifactStore]] discipline).
    */
  def saveAllocation(dir: String, cells: DataFrame, groupCols: Seq[String],
                     budgetCol: String, seed: Long,
                     merges: Seq[(String, String)] = Bpe.StandardMerges): Unit = {
    require(groupCols.nonEmpty, "an allocation needs group columns")
    (groupCols :+ budgetCol).foreach { c =>
      require(cells.columns.contains(c),
        s"allocation cells table is missing `$c` " +
          s"(have: ${cells.columns.mkString(", ")})")
      // the manifest records group_cols as a comma list; a comma-bearing
      // name would round-trip into a DIFFERENT column set at load
      require(!c.contains(","),
        s"allocation column name `$c` contains a comma — it cannot " +
          "round-trip through the manifest's group_cols record")
    }
    // persist ONLY the decision columns: a diagnostic extra (doc counts,
    // token mass) would ride the replay join and collide with corpus
    // columns or silently appear in the sample output
    val decision = cells.select((groupCols :+ budgetCol).map(col): _*)
    // group-key UNIQUENESS is part of the artifact's contract (ADVICE
    // r17): the replay join is a broadcast LEFT join, so a duplicated
    // (groupCols) cell would silently fan out every corpus row in that
    // group — double-counted tokens in the prefix sum and duplicate
    // output rows, the exact silent-corruption class the other gates
    // fail by name. Cells are |groups|-sized by contract, so the check
    // is one tiny aggregation at save time.
    val dup = decision.groupBy(groupCols.map(col): _*)
      .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
      .limit(1).collect()
    require(dup.isEmpty,
      s"allocation cells table has more than one row for group " +
        s"(${groupCols.zipWithIndex.map { case (c, i) => s"$c=${dup.head.get(i)}" }
          .mkString(", ")}) — duplicate cells would fan out every corpus " +
        "row in that group at replay (double-counted budgets, duplicate " +
        "samples); aggregate the cells to one budget per group first")
    ArtifactStore.commit(dir, AllocationFormat, AllocationVersion,
      Seq("cells" -> decision)) { node =>
      node.put("seed", seed)
      node.put("group_cols", groupCols.mkString(","))
      node.put("budget_col", budgetCol)
      node.put("tok", TokenDecontam.tokenizerFingerprint(merges))
    }
  }

  /** Load with every gate by name: manifest format/version, cells
    * `_SUCCESS` + schema, scalar presence.
    */
  def loadAllocation(spark: org.apache.spark.sql.SparkSession,
                     dir: String): Allocation = {
    val m = ArtifactStore.manifest(dir, AllocationFormat, AllocationVersion,
      "mixing allocation")
    val cells = ArtifactStore.table(spark, dir, m, "cells").getOrElse(
      throw new IllegalArgumentException(
        s"$dir: manifest lists no `cells` table — not a mixing allocation"))
    require(m.has("seed") && m.has("group_cols") && m.has("budget_col")
        && m.has("tok"),
      s"$dir/MANIFEST.json: missing seed/group_cols/budget_col/tok scalars " +
        "— a partial or foreign manifest")
    Allocation(cells, m.path("group_cols").asText().split(",").toSeq,
      m.path("budget_col").asText(), m.path("seed").asLong(),
      m.path("tok").asLong())
  }

  /** Deterministic fingerprint of an allocation's full decision content
    * — group cols, budget col, seed, tokenizer, and every cell row
    * (sorted) — the identity a cumulative spend ledger records so
    * tokens spent under one allocation can never silently count
    * against another (re-estimated budgets, a different seed, or a
    * different cell inventory each change what "remaining budget"
    * means). Cells are |groups|-sized by contract, so the collect is
    * bounded; CRC32 matches the [[TokenDecontam.tokenizerFingerprint]]
    * discipline.
    */
  def allocationFingerprint(alloc: Allocation): Long = {
    val crc = new java.util.zip.CRC32()
    def put(s: String): Unit = { crc.update(s.getBytes("UTF-8")); crc.update(0) }
    put(alloc.groupCols.mkString(","))
    put(alloc.budgetCol)
    put(alloc.seed.toString)
    put(alloc.tok.toString)
    alloc.cells.select((alloc.groupCols :+ alloc.budgetCol).map(col): _*)
      .collect()
      .map(_.toSeq.map(String.valueOf).mkString("\u0001"))
      .sorted
      .foreach(put)
    crc.getValue
  }

  /** [[sampleWithAllocation]] under a CUMULATIVE spend ledger (the
    * global-budget reading of a persisted mix): `spent` carries
    * (groupCols, `spentCol`) rows of tokens already selected under THIS
    * allocation by prior runs/waves, and each cell's effective budget
    * becomes `greatest(budget - spent, 0)` — a corpus-growth wave
    * samples only the REMAINDER, so the sum over waves stays within the
    * budget plus at most one crossing document per wave that still had
    * headroom, instead of re-spending the full budget every wave. A
    * cell with no spend row spends from zero; an exhausted cell
    * selects nothing (tokens_before >= 0 can never be < 0). The
    * no-cell refusal and the tokenizer gate of [[sampleWithAllocation]]
    * apply unchanged — the adjusted cells keep the allocation's own
    * group inventory. The ledger is per-cell-per-wave rows (tiny), so
    * the adjustment join is a broadcast.
    */
  def sampleWithAllocationRemaining(df: DataFrame, alloc: Allocation,
                                    idCol: String, tokenCol: String,
                                    spent: DataFrame, spentCol: String,
                                    merges: Seq[(String, String)] = Bpe.StandardMerges)
      : DataFrame = {
    require(spent.columns.contains(spentCol)
        && alloc.groupCols.forall(spent.columns.contains),
      s"spend ledger must expose (${alloc.groupCols.mkString(", ")}, " +
        s"$spentCol) — have (${spent.columns.mkString(", ")})")
    val agg = spent.groupBy(alloc.groupCols.map(col): _*)
      .agg(sum(col(spentCol)).as("__spent"))
    // a spend row whose group has no cell means the ledger and the
    // allocation disagree about the cell inventory — the left join
    // below would silently DROP that spend (budget quietly re-spent),
    // the same silent-corruption class the no-cell refusal guards on
    // the corpus side; both frames are |cells|-sized, so the probe is
    // free
    val orphan = agg.join(alloc.cells, alloc.groupCols, "left_anti")
      .limit(1).collect()
    require(orphan.isEmpty, {
      val r = orphan.head
      s"spend ledger records group (${alloc.groupCols.zipWithIndex
        .map { case (c, i) => s"$c=${r.get(i)}" }.mkString(", ")}) that has " +
        "no cell in the allocation — the ledger was recorded under a " +
        "different cell inventory and its spend would be silently " +
        "ignored; rebuild the ledger under this allocation or restore " +
        "the allocation it was recorded under"
    })
    val remaining = alloc.cells.join(broadcast(agg), alloc.groupCols, "left")
      .withColumn(alloc.budgetCol,
        greatest(col(alloc.budgetCol) - coalesce(col("__spent"), lit(0L)),
          lit(0L)))
      .drop("__spent")
    sampleWithAllocation(df, alloc.copy(cells = remaining), idCol, tokenCol,
      merges)
  }

  /** Replay a persisted mix over a tagged + token-counted corpus frame:
    * verify the TOKENIZER pairing by name (the [[TokenDecontam]]
    * fingerprint discipline — `tokenCol` must have been counted with
    * the same merges the allocation was budgeted in), broadcast-join
    * the budget cells, and fail BY NAME on any group with no cell (an
    * inner join would silently drop the group — the CcnetServing.tag
    * lesson). Selection is [[sampleToTokenBudget]] under the RECORDED
    * seed, so the kept set replays bit-for-bit across sessions.
    */
  def sampleWithAllocation(df: DataFrame, alloc: Allocation, idCol: String,
                           tokenCol: String,
                           merges: Seq[(String, String)] = Bpe.StandardMerges)
      : DataFrame = {
    val fp = TokenDecontam.tokenizerFingerprint(merges)
    require(alloc.tok == fp,
      s"mixing allocation was budgeted under tokenizer fingerprint " +
        s"${alloc.tok} but this corpus is counted under $fp — token budgets " +
        "in one tokenizer's units cannot select over another's counts; " +
        "re-estimate the allocation or load the matching merges table")
    require(!df.columns.contains(alloc.budgetCol),
      s"corpus frame already carries a `${alloc.budgetCol}` column — the " +
        "allocation's budgets would join ambiguously against it; drop the " +
        "in-session column and let the PERSISTED allocation be the one " +
        "authority for budgets")
    // the failure names the COLUMNS as well as the values, and a null
    // group key renders as a visible NULL instead of an empty segment
    // (ADVICE r17 — mirrors CcnetServing.tag's message discipline)
    val groupDesc = concat_ws(", ", alloc.groupCols.map(c =>
      concat(lit(s"$c="), coalesce(col(c).cast("string"), lit("NULL")))): _*)
    val joined = df.join(broadcast(alloc.cells), alloc.groupCols, "left")
      .withColumn(alloc.budgetCol,
        when(col(alloc.budgetCol).isNull,
          raise_error(concat(
            lit("sampleWithAllocation: group ("), groupDesc,
            lit(") has no cell in the persisted allocation — the mix was " +
              "estimated on a different group inventory; re-estimate or " +
              "route the group out before sampling"))))
          .otherwise(col(alloc.budgetCol)))
    sampleToTokenBudget(joined, alloc.groupCols, idCol, tokenCol,
      alloc.budgetCol, alloc.seed)
  }
}
