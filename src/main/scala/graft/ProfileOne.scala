package graft
import org.apache.spark.sql.SparkSession

/** Dev helper: profile named queries exactly like the bench ledgers do —
  * [[graft.observability.QueryMetrics.profile]] on a warm session (one
  * untimed warmup run each, then N profiled samples). Usage:
  * `tools/run_graft.sh graft.ProfileOne <sfDir> <q1,q2,...> [samples]`.
  */
object ProfileOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val samples = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (name <- names) { // warmup: codegen + probe caches + file footers
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }
    for (s <- 1 to samples; name <- names) {
      val (_, p) = observability.QueryMetrics.profile(
        SparkEntry.queries(name)(spark, dir))
      println(f"S$s $name%-28s wall=${p.wallMs / 1e3}%6.3f s scan=${p.scanRows}%9d " +
        f"shufB=${p.shuffleWriteBytes}%10d expand=${p.expandRows}%9d")
    }
    spark.stop()
  }
}
