package graft

import org.apache.spark.sql.functions._

/** Scratch perf probe for the IVF centroid-ranking stage (not a test —
  * run via `sbt "Test/runMain graft.IvfProbe [rows] [dim] [reps]"`).
  *
  * Question (round-10 prescription #7): the per-query probe selection
  * builds an nlist-element struct array and `array_sort`s it with an
  * interpreted lambda comparator (`IvfSearch.scala` probes) — fine at
  * nlist=16, unmeasured at production nlist≈256. This probe times the
  * ranking projection ALONE (no corpus join) at nlist ∈ {16, 256} for
  * three formulations:
  *   lambda  — the shipped comparator (interpreted HigherOrderFunction);
  *   struct  — array_sort with the DEFAULT ordering over
  *             struct(-score, cluster) (negated score first field makes
  *             ascending == best-first; no lambda);
  *   nosort  — identical plan minus the array_sort (explode the first
  *             nprobe unsorted entries): the lambda-vs-nosort delta IS
  *             the ranking cost, everything else held equal.
  */
object IvfProbe {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(20000)
    val dim = args.lift(1).map(_.toInt).getOrElse(64)
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    import graft.functions.VectorFns

    val rng = new scala.util.Random(42)
    def vec() = Array.fill(dim)(rng.nextGaussian())
    val qdf = spark.range(rows.toLong)
      .select(col("id").as("query_id"),
        typedlit((0 until dim).map(_ => 0.0)).as("zero"))
      .withColumn("qv", transform(col("zero"), _ + rand(7) - lit(0.5)))
      .drop("zero")
      .cache()
    qdf.count()

    for (nlist <- Seq(16, 256); nprobe = math.max(4, nlist / 16)) {
      val cents = Array.fill(nlist)(vec())
      def centCol(c: Array[Double]) = typedlit(c.toSeq)
      val scored = cents.zipWithIndex.map { case (c, i) =>
        struct(VectorFns.dotPre(col("qv"), centCol(c)).as("s"), lit(i).as("c"))
      }
      val negScored = cents.zipWithIndex.map { case (c, i) =>
        struct((-VectorFns.dotPre(col("qv"), centCol(c))).as("s"), lit(i).as("c"))
      }
      val variants: Seq[(String, org.apache.spark.sql.DataFrame)] = Seq(
        "lambda" -> qdf.withColumn("probe", explode(slice(array_sort(
            array(scored: _*),
            (a, b) => when(a.getField("s") > b.getField("s"), -1)
              .when(a.getField("s") < b.getField("s"), 1).otherwise(0)), 1, nprobe)))
          .select(col("query_id"), col("probe.c").as("cluster")),
        "struct" -> qdf.withColumn("probe", explode(slice(
            array_sort(array(negScored: _*)), 1, nprobe)))
          .select(col("query_id"), col("probe.c").as("cluster")),
        "nosort" -> qdf.withColumn("probe", explode(slice(
            array(scored: _*), 1, nprobe)))
          .select(col("query_id"), col("probe.c").as("cluster")))
      for ((name, df) <- variants) {
        val ts = (1 to reps).map { _ =>
          val t0 = System.nanoTime()
          df.write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"[ivfprobe] nlist=$nlist%3d nprobe=$nprobe%2d $name%-9s " +
          ts.map(t => f"$t%.2f").mkString(" ") + f"  min=${ts.min}%.2f s")
      }
    }
    spark.stop()
  }
}
