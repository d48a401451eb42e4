package graft

/** Scratch perf probe (not a test — run via
  * `sbt "Test/runMain graft.QueryProbe <qname> [dir] [reps]"`). Times each
  * bench-style rep separately so cache hits vs recomputes are visible.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q96_bfs_levels")
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val reps = args.lift(2).map(_.toInt).getOrElse(3)
    val spark = GraftSession.get()
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, d)
      df.write.format("noop").mode("overwrite").save()
      println(f"[probe] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
