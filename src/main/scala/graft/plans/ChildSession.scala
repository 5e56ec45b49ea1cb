package graft.plans

import org.apache.spark.sql.SparkSession

/** `newSession()` with the parent's RUNTIME execution confs carried over.
  *
  * A bare `newSession()` builds its SQLConf from builder-time SparkConf
  * entries only — runtime `spark.conf.set` values on the parent (the
  * shuffle-partition overrides PropertySpec's parallelism-invariance
  * harness applies, a driver's timezone pin) silently reset to defaults in
  * the child. Every rule-demo module that isolates a rule flag in a child
  * session must route through here, or its queries run at the BUILDER
  * parallelism no matter what the caller set — which made the invariance
  * property vacuous for child-session queries until r10.
  */
private[plans] object ChildSession {
  private val Carried =
    Seq("spark.sql.shuffle.partitions", "spark.sql.session.timeZone")

  def apply(spark0: SparkSession): SparkSession = {
    val s = spark0.newSession()
    for (k <- Carried) s.conf.set(k, spark0.conf.get(k))
    s
  }
}
