package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Ad-hoc profiling main for the optimization rounds: same session shape
  * and populate phase as [[Bench]], then for each named query prints a
  * metrics line (min-of-2 warm samples through
  * [[observability.QueryMetrics.profile]]) and optionally dumps the
  * `explain("formatted")` plan to a file.
  *
  * Usage: `Profile <sfDir> <q1,q2,...> [explainDir] [tag]`
  *   - metrics go to stdout as one line per query:
  *     `PROFILE name wall_s scanRows scanBytes shuffleBytes shuffleRecs
  *      spillBytes expandRows outputRows`
  *   - with `explainDir`, each query's formatted plan lands at
  *     `<explainDir>/<name>_<tag>.txt` (tag defaults to "before").
  *
  * This is a measurement tool, not a declared query: nothing here is
  * registered in [[SparkEntry.queries]] and no result is persisted.
  */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val names = if (args.length > 1) args(1).split(",").toSeq else Seq.empty
    val explainDir = if (args.length > 2 && args(2).nonEmpty) Some(args(2))
      else None
    val tag = if (args.length > 3) args(3) else "before"
    // "fresh" repeats memoized work per run (the bench second-sample
    // discipline): entries whose timed work is a memoized build must
    // re-run it, not hit the memo
    val fresh = args.length > 4 && args(4) == "fresh"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    Bench.populate(spark, sfDir)
    val qs = SparkEntry.queries
    for (name <- names) qs.get(name) match {
      case None => System.err.println(s"[profile] no such query: $name")
      case Some(fn) =>
        spark.sparkContext.setJobDescription(s"profile:$name")
        try {
          if (fresh) {
            // bench-style timing (t0 before fn, so memoized builds that run
            // at DataFrame construction are INSIDE the clock), with
            // Memos.newGeneration before each run so the build repeats —
            // the bench second-sample discipline
            def run(): Double = {
              Memos.newGeneration()
              val t0 = System.nanoTime()
              fn(spark, sfDir).write.format("noop").mode("overwrite").save()
              (System.nanoTime() - t0) / 1e9
            }
            run() // warm
            val a = run(); val b = run()
            println(f"PROFILE $name ${math.min(a, b)}%.3f fresh " +
              f"hi=${math.max(a, b)}%.3f")
          } else {
          // warm run via the bench's own sink, then min-of-2 profiled runs
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val a = observability.QueryMetrics.profile(fn(spark, sfDir))._2
          val b = observability.QueryMetrics.profile(fn(spark, sfDir))._2
          val p = if (a.wallMs <= b.wallMs) a else b
          println(f"PROFILE $name ${p.wallMs / 1e3}%.3f ${p.scanRows} " +
            s"${p.scanBytes} ${p.shuffleWriteBytes} ${p.shuffleRecordsWritten} " +
            s"${p.spillBytes} ${p.expandRows} ${p.outputRows} " +
            f"hi=${math.max(a.wallMs, b.wallMs) / 1e3}%.3f")
          }
          explainDir.foreach { d =>
            val f = new java.io.File(d, s"${name}_$tag.txt")
            f.getParentFile.mkdirs()
            val plan = fn(spark, sfDir).queryExecution
              .explainString(ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(f.toPath,
              plan.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          }
        } catch { case e: Throwable =>
          System.err.println(s"[profile] $name FAILED: ${e.getMessage}")
        } finally spark.sparkContext.setJobDescription(null)
    }
    spark.stop()
  }
}
