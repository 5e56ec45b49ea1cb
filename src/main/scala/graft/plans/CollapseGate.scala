package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.SQLConfHelper
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.internal.Logging

/** The shared cost gate behind the aggregate-moving rewrites
  * ([[EagerAggregation]]'s below-join partial, [[RerollExpandAggregate]]'s
  * below-Expand leaf): both pay one extra exchange of leaf-grain rows to
  * remove work proportional to the input, so both are wins exactly when
  * the leaf grain COLLAPSES the input hard enough — and, at bench-able
  * scale, when the work removed is large enough in ABSOLUTE terms to
  * outrun the rewrite's fixed costs (an extra aggregation stage and its
  * exchange). Two thresholds, both conf-tunable per rule:
  *
  *  - [[MaxRatioKey]]: |distinct leaf keys| / |rows| must be ≤ this.
  *    Default 0.1 — the sf0.1 ledgers put the wall break-even between a
  *    4:1 collapse (measured LOSS: the leaf hash-aggregate costs more
  *    than the shuffled rows it saves) and a ~600:1 collapse (measured
  *    win), so the default demands an order of magnitude. A cluster
  *    whose exchanges hit real network can loosen it.
  *  - [[MinSavedRowsKey]]: `savedFactor × rows × (1 − ratio)` — the
  *    caller's estimate of rows removed from the pre-shuffle path (the
  *    join exchange for eager aggregation; the Expand replication,
  *    `savedFactor = G−1`, for the re-roll) — must be ≥ this. Guards the
  *    FIXED cost: below a few million saved rows the extra exchange
  *    dominates on any hardware this was measured on; at 100 TB any
  *    qualifying plan clears it by orders of magnitude. Per-rule default
  *    (constructor): 0 disables the floor.
  *
  * Estimation order:
  *
  *  1. Catalog stats, when the plan carries a row count AND a distinct
  *     count for every (attribute) leaf key — the CBO/ANALYZE path, free.
  *  2. Else a probe: one `count + approx_count_distinct` pass over the key
  *     columns, executed through [[org.apache.spark.sql.graft.PlanDF]]
  *     with a re-entrancy latch held (rules must skip the probe's own
  *     optimization), cached per canonicalized (plan, keys, conf). The
  *     probe's own shape is picked by [[ProbeRowsKey]] / [[SampleModKey]]:
  *       - `probeRows < 0` (default) + `sampleMod > 1` (default 16): a
  *         KEY-HASH-SAMPLED probe — rows with `hash(keys) % mod ≠ 0` pass
  *         only through `count`, and the distinct sketch sees 1/mod of the
  *         KEYS, each kept or dropped with ALL its rows. Because sampling
  *         is key-coherent, `d_s / n_s` is an (asymptotically) unbiased
  *         estimate of ndv/rows at ~1/mod the aggregation cost — unlike a
  *         LIMIT prefix, which over-observes distincts (see below). The
  *         exact total row count rides the same single pass.
  *       - `probeRows < 0` + `sampleMod ≤ 1`: the full exact probe (every
  *         key into the sketch).
  *       - `probeRows > 0`: a LIMIT-prefix probe — cheapest, but BIASED
  *         TOWARD DECLINING when keys are spread uniformly through the
  *         input (a random 100k-row prefix of a 4-rows-per-key fact covers
  *         ~73% distinct keys where the full input collapses to 0.25 —
  *         measured at sf0.1; sampling distinct counts is the classic
  *         under-observable). Kept as an opt-in for truly enormous
  *         un-ANALYZEd inputs where even one cheap pass is too much.
  *       - `probeRows = 0`: gate disabled (the rewrite fires ungated).
  *
  * Inputs smaller than `minRows` skip the gate — the estimate is too noisy
  * to act on and the decision too cheap to matter. Streaming children skip
  * it too (no batch probe possible). Either failure mode costs one
  * redundant shuffle or one forgone win, never a wrong answer.
  */
final class CollapseGate(rule: String, confPrefix: String,
    defaultMinSavedRows: Long = 0L)
    extends SQLConfHelper with Logging {

  val MaxRatioKey = s"$confPrefix.maxCollapseRatio"
  val ProbeRowsKey = s"$confPrefix.probeRows"
  val MinRowsKey = s"$confPrefix.minGateRows"
  val SampleModKey = s"$confPrefix.probeSampleMod"
  val MinSavedRowsKey = s"$confPrefix.minSavedRows"

  /** Re-entrancy latch shared by ALL gates on the thread: a probe's own
    * optimization must not probe (rules consult [[probing]] in apply).
    */
  def probing: Boolean = CollapseGate.probing.get

  // (rows, ratio) per canonicalized (plan, keys, probe conf); boxed value
  // so a missing key reads as null, never as a zero hit
  private val ratioCache =
    new java.util.concurrent.ConcurrentHashMap[String, (Long, Double)]()

  /** Cache entry count — EagerAggSpec pins that re-building the same query
    * does NOT re-probe (the r11 cache-key exprId bug's regression guard).
    */
  private[graft] def probeCacheSize: Int = ratioCache.size

  /** true = rewrite, false = decline. `savedFactor` scales the estimated
    * saved rows: 1 for eager aggregation (rows removed from the join
    * exchange ≈ rows − leafGroups), G−1 for the re-roll (Expand copies
    * avoided per input row).
    */
  def ok(child: LogicalPlan, keys: Seq[Expression],
      savedFactor: Double = 1.0): Boolean = {
    val maxRatio = conf.getConfString(MaxRatioKey, "0.1").toDouble
    val probeRows = conf.getConfString(ProbeRowsKey, "-1").toLong
    val minRows = conf.getConfString(MinRowsKey, "1000").toLong
    val sampleMod = conf.getConfString(SampleModKey, "16").toInt
    val minSaved =
      conf.getConfString(MinSavedRowsKey, defaultMinSavedRows.toString).toLong
    if (probeRows == 0 || child.isStreaming) return true

    def decide(rows: Long, ratio: Double): Boolean = {
      if (rows < minRows) return true // too small to gate: always rewrite
      val saved = savedFactor * rows * (1.0 - ratio)
      val accept = ratio <= maxRatio && saved >= minSaved
      if (!accept) logInfo(f"$rule declined: collapse ratio $ratio%.4f " +
        f"(max $maxRatio), saved rows ≈ $saved%.0f (min $minSaved)")
      accept
    }

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
          return decide(rc.toLong, ndv.toDouble / rc.toDouble)
        }
      case None => ()
    }

    // --- probe path ----------------------------------------------------
    val spark = SparkSession.getActiveSession.getOrElse(return true)
    // key normalization: QueryPlan.canonicalized renumbers the CHILD's
    // exprIds positionally, but Expression.canonicalized does NOT — a key
    // stringified with its live exprIds is unique per DataFrame
    // construction, which made this cache miss (and the probe re-scan the
    // fact) on every query build until r11. Rewrite each attribute to its
    // position in child.output first.
    val pos: Map[Long, Int] = child.output.map(_.exprId.id).zipWithIndex.toMap
    val keyTag = keys.map(_.canonicalized.transformUp {
      case a: Attribute => Literal(pos.getOrElse(a.exprId.id, -1))
    }.toString).mkString(",")
    val cacheKey = child.canonicalized.toString + "|" + keyTag +
      "|" + probeRows + "|" + sampleMod
    val cached = ratioCache.get(cacheKey)
    val (rows, ratio): (Long, Double) = if (cached != null) cached else {
      CollapseGate.probing.set(true)
      try {
        import org.apache.spark.sql.catalyst.plans.logical.{Limit, Project}
        val named = keys.zipWithIndex.map { case (k, i) =>
          Alias(k, s"_gate_k$i")(): NamedExpression
        }
        // full probe: no Limit node at all — a huge LIMIT would plan as
        // CollectLimit and funnel the scan through one partition
        val probePlan: LogicalPlan =
          if (probeRows < 0) Project(named, child)
          else Limit(Literal(probeRows.min(Int.MaxValue.toLong).toInt),
            Project(named, child))
        val probe = org.apache.spark.sql.graft.PlanDF.ofRows(spark, probePlan)
        val keyCols = named.map(n => probe.col(n.name))
        val mod = if (probeRows < 0) sampleMod else 1 // prefix probe: exact
        val row = CollapseGate.probeAgg(probe, keyCols, mod).head()
        val n = row.getLong(0)
        val ns = row.getLong(1)
        val d = row.getLong(2)
        // ns == 0 with n > 0: fewer than ~mod distinct keys exist at all —
        // the collapse is extreme, ratio ≈ 0
        val r = if (ns == 0) 0.0 else d.toDouble / ns.toDouble
        ratioCache.put(cacheKey, (n, r))
        (n, r)
      } catch { case e: Throwable =>
        logWarning(s"$rule probe failed, skipping gate: $e")
        ratioCache.put(cacheKey, (Long.MaxValue, 0.0))
        (Long.MaxValue, 0.0)
      } finally CollapseGate.probing.set(false)
    }
    decide(rows, ratio)
  }
}

object CollapseGate {
  private val probing = new ThreadLocal[java.lang.Boolean] {
    override def initialValue: java.lang.Boolean = false
  }

  /** The probe aggregate over `df` with `keyCols` as the leaf keys: one
    * row `(n, ns, d)` — total rows, key-hash-sampled rows, distinct
    * sampled keys (HLL). `sampleMod ≤ 1` keeps every key (`ns = n`, `d`
    * exact-probe). Exposed so the bench ledger and the gate spec measure
    * the SAME probe the gate runs.
    */
  def probeAgg(df: DataFrame, keyCols: Seq[Column], sampleMod: Int): DataFrame = {
    import org.apache.spark.sql.functions._
    if (sampleMod <= 1)
      df.agg(count(lit(1)).as("n"), count(lit(1)).as("ns"),
        approx_count_distinct(struct(keyCols: _*)).as("d"))
    else {
      // key-coherent sample: a key's rows are kept or dropped as a unit,
      // so d/ns estimates ndv/rows without the prefix probe's bias
      val s = pmod(hash(keyCols: _*), lit(sampleMod)) === 0
      df.agg(count(lit(1)).as("n"),
        count(when(s, 1)).as("ns"),
        approx_count_distinct(when(s, struct(keyCols: _*))).as("d"))
    }
  }
}
