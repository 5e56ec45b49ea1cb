package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.SQLConfHelper
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.internal.Logging

/** The shared cost gate behind the aggregate-moving rewrites
  * ([[EagerAggregation]]'s below-join partial, [[RerollExpandAggregate]]'s
  * below-Expand leaf): both pay one extra exchange of leaf-grain rows to
  * remove work proportional to the input, so both are wins exactly when
  * the leaf grain COLLAPSES the input — |distinct leaf keys| / |rows| must
  * clear a threshold, or the rewrite is pure cost.
  *
  * Estimation order:
  *
  *  1. Catalog stats, when the plan carries a row count AND a distinct
  *     count for every (attribute) leaf key — the CBO/ANALYZE path, free.
  *  2. Else a probe: `SELECT count(1), approx_count_distinct(struct(keys))`
  *     over the child, executed through [[org.apache.spark.sql.graft.PlanDF]]
  *     with a re-entrancy latch held (rules must skip the probe's own
  *     optimization), cached per canonicalized (plan, keys). `probeRows`
  *     < 0 (each rule's default) probes the WHOLE child — the exact ratio,
  *     one cached pass over the key columns; > 0 bounds the probe with a
  *     LIMIT prefix, which is cheaper but BIASED TOWARD DECLINING when keys
  *     are spread uniformly through the input (a random 100k-row prefix of
  *     a 4-rows-per-key fact covers ~73% distinct keys where the full input
  *     collapses to 0.25 — measured at sf0.1; sampling distinct counts is
  *     the classic under-observable); = 0 disables the gate (the rewrite
  *     fires ungated).
  *
  * Inputs smaller than `minRows` skip the gate — the estimate is too noisy
  * to act on and the decision too cheap to matter. Streaming children skip
  * it too (no batch probe possible). Either failure mode costs one
  * redundant shuffle or one forgone win, never a wrong answer.
  */
final class CollapseGate(rule: String, confPrefix: String)
    extends SQLConfHelper with Logging {

  val MaxRatioKey = s"$confPrefix.maxCollapseRatio"
  val ProbeRowsKey = s"$confPrefix.probeRows"
  val MinRowsKey = s"$confPrefix.minGateRows"

  /** Re-entrancy latch shared by ALL gates on the thread: a probe's own
    * optimization must not probe (rules consult [[probing]] in apply).
    */
  def probing: Boolean = CollapseGate.probing.get

  // java.lang.Double, NOT Double: a primitive-valued map's get would unbox
  // a missing key's null straight to 0.0 and read as a cache hit
  private val ratioCache =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Double]()

  /** true = rewrite, false = decline. */
  def ok(child: LogicalPlan, keys: Seq[Expression]): Boolean = {
    val maxRatio = conf.getConfString(MaxRatioKey, "0.5").toDouble
    val probeRows = conf.getConfString(ProbeRowsKey, "-1").toLong
    val minRows = conf.getConfString(MinRowsKey, "1000").toLong
    if (probeRows == 0 || child.isStreaming) return true

    // --- stats path: rowCount + per-key distinctCount when ANALYZEd ----
    val stats = child.stats
    stats.rowCount match {
      case Some(rc) if rc.toLong < minRows => return true
      case Some(rc) =>
        val ndvs = keys.map {
          case a: Attribute =>
            stats.attributeStats.get(a).flatMap(_.distinctCount)
          case _ => None
        }
        if (ndvs.forall(_.isDefined)) {
          // independence upper bound, capped by the row count itself
          val ndv = ndvs.flatten.foldLeft(BigInt(1))(_ * _).min(rc)
          return ndv.toDouble / rc.toDouble <= maxRatio
        }
      case None => ()
    }

    // --- probe path ----------------------------------------------------
    val spark = SparkSession.getActiveSession.getOrElse(return true)
    val cacheKey = child.canonicalized.toString + "|" +
      keys.map(_.canonicalized.toString).mkString(",") + "|" + probeRows
    val cached = ratioCache.get(cacheKey)
    val ratio: Double = if (cached != null) cached.doubleValue() else {
      CollapseGate.probing.set(true)
      try {
        import org.apache.spark.sql.catalyst.plans.logical.{Limit, Project}
        import org.apache.spark.sql.functions.{approx_count_distinct, count, lit, struct}
        val named = keys.zipWithIndex.map { case (k, i) =>
          Alias(k, s"_gate_k$i")(): NamedExpression
        }
        // full probe (default): no Limit node at all — a huge LIMIT would
        // plan as CollectLimit and funnel the scan through one partition
        val probePlan: LogicalPlan =
          if (probeRows < 0) Project(named, child)
          else Limit(Literal(probeRows.min(Int.MaxValue.toLong).toInt),
            Project(named, child))
        val probe = org.apache.spark.sql.graft.PlanDF.ofRows(spark, probePlan)
        val row = probe.agg(count(lit(1)).as("n"),
          approx_count_distinct(struct(named.map(n =>
            probe.col(n.name)): _*)).as("d")).head()
        val n = row.getLong(0)
        val r = if (n < minRows) 0.0 // too small to gate: always rewrite
          else row.getLong(1).toDouble / n.toDouble
        ratioCache.put(cacheKey, r)
        r
      } catch { case e: Throwable =>
        logWarning(s"$rule probe failed, skipping gate: $e")
        ratioCache.put(cacheKey, 0.0)
        0.0
      } finally CollapseGate.probing.set(false)
    }
    if (ratio > maxRatio)
      logInfo(f"$rule declined: collapse ratio $ratio%.3f > $maxRatio")
    ratio <= maxRatio
  }
}

object CollapseGate {
  private val probing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }
}
