package graft

import java.nio.file.{Files, Paths}

/** Optimization-round triage tool: dump `.explain("formatted")` for named
  * queries to files and (optionally) time the noop-sink force per query.
  *
  * Usage:
  *   sbt "runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir] [reps]"
  *
  * Writes <outDir>/<queryName>_<suffix>.txt per query — the committed
  * before/after evidence the round deliverables require (plans/r19/...).
  * The explained plan is taken AFTER one forced execution so AQE's final
  * plan (not the static estimate) is what lands in the file, matching how
  * the bench actually runs the query. With reps > 0, per-rep noop-force
  * seconds print to stdout as `[plandump] <name> reps=[...]`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <suffix> <q1,q2,..> [sfDir] [reps]")
    val outDir = Paths.get(args(0))
    val suffix = args(1)
    val prefixes = args(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val reps = if (args.length > 4) args(4).toInt else 3
    Files.createDirectories(outDir)
    val spark = GraftSession.get()
    val selected = SparkEntry.allQueries.filter(q => prefixes.exists(p =>
      q.name == p || q.name.startsWith(p + "_")))
    selected.foreach { q =>
      spark.sparkContext.setJobDescription(s"plandump:${q.name}")
      val df = q.run(spark, sfDir)
      // warm once so codegen is compiled and AQE finalizes, then time
      df.write.format("noop").mode("overwrite").save()
      // per rep: plan = analysis+optimization+physical planning of a fresh
      // tree (what every bench rep re-pays); exec = the noop force
      val times = (0 until reps).map { _ =>
        val tb0 = System.nanoTime()
        val fresh = q.run(spark, sfDir)
        val tb = (System.nanoTime() - tb0) / 1e9
        val tp0 = System.nanoTime()
        fresh.queryExecution.executedPlan
        val tp = (System.nanoTime() - tp0) / 1e9
        val t0 = System.nanoTime()
        fresh.write.format("noop").mode("overwrite").save()
        (tb, tp, (System.nanoTime() - t0) / 1e9)
      }
      // the executed (AQE-final) plan of the warmed run
      val executed = df.queryExecution.executedPlan.toString
        .split("== Initial Plan ==")(0)
      val formatted = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      val body = formatted + "\n\n== Executed (AQE final) ==\n" + executed
      Files.writeString(outDir.resolve(s"${q.name}_$suffix.txt"), body)
      val repsStr = times.map { case (tb, tp, te) =>
        f"{build:$tb%.3f,plan:$tp%.3f,exec:$te%.3f}" }.mkString("[", ",", "]")
      println(s"[plandump] ${q.name} reps=$repsStr")
    }
    spark.stop()
  }
}
