package graft

import graft.plans.{AsOfJoin, AsOfJoinExec, AsOfJoinQueries}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native as-of merge join: semantics on hand-built edge cases, the
  * equivalence with the union-window composition on real data, and the
  * physical plan contract (one AsOfJoinExec, shuffled + sorted children,
  * no pairwise product anywhere).
  */
class AsOfJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ticks(rows: (Long, Long, String)*): DataFrame =
    rows.toDF("k", "t", "tag")

  private def quotes(rows: (Long, Long, Double)*): DataFrame =
    rows.toDF("qk", "qt", "px")

  private def run(l: DataFrame, r: DataFrame,
      tol: Option[Long] = None): Set[(Long, Long, Option[Double])] =
    AsOfJoin.asofLeft(l, r, "k", "t", "qk", "qt", tol)
      .select($"k", $"t", $"px")
      .collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) None else Some(row.getDouble(2))))
      .toSet

  test("picks the latest at-or-before right row, nulls when none") {
    val l = ticks((1L, 10L, "a"), (1L, 20L, "b"), (1L, 5L, "pre"),
      (2L, 7L, "c"), (3L, 9L, "lonely"))
    val r = quotes((1L, 6L, 1.0), (1L, 10L, 2.0), (1L, 15L, 3.0),
      (2L, 7L, 4.0), (4L, 1L, 9.9))
    assert(run(l, r) === Set(
      (1L, 5L, None),        // before any quote
      (1L, 10L, Some(2.0)),  // equal timestamp matches (>= bound)
      (1L, 20L, Some(3.0)),  // latest of several
      (2L, 7L, Some(4.0)),
      (3L, 9L, None)))       // key only on left
  }

  test("forward as-of picks the earliest at-or-after right row") {
    val l = ticks((1L, 10L, "a"), (1L, 30L, "b"), (2L, 50L, "c"))
    val r = quotes((1L, 10L, 1.0), (1L, 25L, 2.0), (1L, 5L, 0.5),
      (2L, 40L, 3.0))
    val out = AsOfJoin.asofForwardLeft(l, r, "k", "t", "qk", "qt")
      .select($"k", $"t", $"px").collect()
      .map(row => (row.getLong(0), row.getLong(1),
        if (row.isNullAt(2)) None else Some(row.getDouble(2)))).toSet
    assert(out === Set(
      (1L, 10L, Some(1.0)),  // equal timestamp matches (inclusive bound)
      (1L, 30L, None),       // nothing at-or-after 30 for key 1
      (2L, 50L, None)))      // quote at 40 is BEFORE — must not match
    // forward tolerance bounds the wait, no fallback to later rows
    val tl = ticks((1L, 10L, "x"))
    val tr = quotes((1L, 100L, 9.0))
    val withTol = AsOfJoin.asofForwardLeft(tl, tr, "k", "t", "qk", "qt",
        toleranceUs = Some(50L))
      .select($"px").collect().head
    assert(withTol.isNullAt(0), "wait of 90 exceeds tolerance 50")
  }

  test("tolerance drops matches older than the bound, keeps newer ones") {
    val l = ticks((1L, 100L, "x"), (1L, 200L, "y"))
    val r = quotes((1L, 95L, 1.0), (1L, 110L, 2.0))
    // at t=200 the latest quote is 110 (90 ticks back): tol 50 drops it —
    // and must NOT fall back to an even older quote
    assert(run(l, r, tol = Some(50L)) ===
      Set((1L, 100L, Some(1.0)), (1L, 200L, None)))
  }

  test("compound keys match lexicographically, never across groups") {
    val l = Seq((1L, 10L, 105L, "a"), (1L, 20L, 205L, "b"),
      (2L, 10L, 103L, "c"))
      .toDF("k1", "k2", "t", "tag")
    val r = Seq((1L, 10L, 100L, 1.0), (1L, 20L, 200L, 2.0),
      (1L, 10L, 104L, 1.5), (2L, 20L, 100L, 9.9))
      .toDF("q1", "q2", "qt", "px")
    val out = AsOfJoin.asofLeftKeys(l, r,
        Seq("k1", "k2"), "t", Seq("q1", "q2"), "qt")
      .select($"tag", $"px").collect()
      .map(row => (row.getString(0),
        if (row.isNullAt(1)) None else Some(row.getDouble(1)))).toSet
    assert(out === Set(
      ("a", Some(1.5)),  // (1,10): latest of the two same-group quotes
      ("b", Some(2.0)),  // (1,20)
      ("c", None)))      // (2,10): (2,20)'s quote must NOT leak across k2
  }

  test("negative tolerance is rejected loudly, not treated as unbounded") {
    val l = ticks((1L, 10L, "a"))
    val r = quotes((1L, 5L, 1.0))
    intercept[IllegalArgumentException] {
      AsOfJoin.asofLeft(l, r, "k", "t", "qk", "qt", toleranceUs = Some(-1L))
    }
    // zero tolerance is legal: only an exact-timestamp match survives
    assert(run(l, r, tol = Some(0L)) === Set((1L, 10L, None)))
    assert(run(ticks((1L, 5L, "x")), r, tol = Some(0L)) ===
      Set((1L, 5L, Some(1.0))))
  }

  test("empty right side, duplicate left timestamps, null times") {
    val l = ticks((1L, 10L, "a"), (1L, 10L, "b"))
    assert(run(l, quotes()) === Set((1L, 10L, None)))
    // null left time -> unmatched; null right time -> skipped
    val lNull = Seq((1L, Some(10L), "a"), (1L, None, "n"))
      .toDF("k", "t", "tag")
    val rNull = Seq((1L, Some(5L), 1.0), (1L, None, 7.7))
      .toDF("qk", "qt", "px")
    val out = AsOfJoin.asofLeft(lNull, rNull, "k", "t", "qk", "qt")
      .select($"tag", $"px").collect()
      .map(r => (r.getString(0), if (r.isNullAt(1)) None else Some(r.getDouble(1))))
      .toSet
    assert(out === Set(("a", Some(1.0)), ("n", None)))
  }

  test("matches the union-window composition on real events data") {
    val ev = Tables.events(spark, sf).filter($"ts".isNotNull)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
      .select($"user_id".as("c_uid"), unix_micros($"ts").as("c_us"), $"click_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
    val native = AsOfJoin.asofLeft(purchases, clicks,
        "user_id", "p_us", "c_uid", "c_us")
      .select($"event_id", coalesce($"click_id", lit(-1L)).as("click_id"))
    // the composed reference: tag, union, running last() per user
    val cTagged = clicks.select($"c_uid".as("user_id"), $"c_us".as("us"),
      lit(0).as("tag"), $"click_id", lit(null).cast("bigint").as("event_id"))
    val pTagged = purchases.select($"user_id", $"p_us".as("us"),
      lit(1).as("tag"), lit(null).cast("bigint").as("click_id"), $"event_id")
    val w = Window.partitionBy($"user_id").orderBy($"us", $"tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val composed = cTagged.unionByName(pTagged)
      .withColumn("prior", last($"click_id", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"event_id", coalesce($"prior", lit(-1L)).as("click_id"))
    assert(native.exceptAll(composed).isEmpty && composed.exceptAll(native).isEmpty,
      "native exec and union-window composition must agree row-for-row")
    assert(native.count() === purchases.count(),
      "left as-of preserves exactly one row per left row")
  }

  test("plan: one AsOfJoinExec, shuffled+sorted children, no products") {
    val df = AsOfJoinQueries.asofExec(spark, sf)
    df.collect() // materialize so AQE finalizes the plan
    val p = df.queryExecution.executedPlan
    val execs = collectAll(p) { case e: AsOfJoinExec => e }
    assert(execs.size === 1, s"expected one AsOfJoinExec:\n$p")
    val shuffles = collectAll(p) { case s: ShuffleExchangeLike => s }
    assert(shuffles.nonEmpty, "children must be hash-clustered on the key")
    val products = collectAll(p) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
      case b: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => b
    }
    assert(products.isEmpty, "as-of must never plan a pairwise product")
    // the exec DECLARES (key, time) output ordering — downstream sorts get
    // elided on its strength, so verify it on the raw join output (the
    // registered query re-ranges by event_id afterwards)
    val l = (1 to 400).map(i => (i.toLong % 7, i.toLong, i)).toDF("k", "t", "v")
    val r = (1 to 50).map(i => (i.toLong % 7, i.toLong, i * 1.0)).toDF("qk", "qt", "px")
    val okWithin = AsOfJoin.asofLeft(l, r, "k", "t", "qk", "qt")
      .select($"k", $"t").rdd
      .mapPartitions { it =>
        val rows = it.map(row => (row.getLong(0), row.getLong(1))).toSeq
        Iterator.single(rows == rows.sorted)
      }.collect()
    assert(okWithin.forall(identity), "output must stay (key, time)-sorted per partition")
  }

  test("bucketed (key, time)-sorted tables feed the exec with ZERO exchanges") {
    // the 100 TB story: pay the layout once at ingest, then every as-of
    // run on that key is scan + merge — no shuffle anywhere in the plan
    val ev = Tables.events(spark, sf).filter($"ts".isNotNull)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
      .select($"user_id".as("c_uid"), unix_micros($"ts").as("c_us"), $"click_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
    warehouse.Bucketing.writeBucketedSorted(purchases,
      "asof_purch_b", "user_id", 4, Seq("user_id", "p_us"))
    warehouse.Bucketing.writeBucketedSorted(clicks,
      "asof_clicks_b", "c_uid", 4, Seq("c_uid", "c_us"))
    val df = AsOfJoin.asofLeft(spark.table("asof_purch_b"),
      spark.table("asof_clicks_b"), "user_id", "p_us", "c_uid", "c_us")
    df.collect()
    val p = df.queryExecution.executedPlan
    val shuffles = collectAll(p) { case s: ShuffleExchangeLike => s }
    assert(shuffles.isEmpty,
      s"bucketed as-of must plan zero exchanges:\n$p")
    assert(collectAll(p) { case e: AsOfJoinExec => e }.size === 1)
    // and the result equals the shuffling plan's
    val plain = AsOfJoin.asofLeft(purchases, clicks,
      "user_id", "p_us", "c_uid", "c_us")
    assert(df.exceptAll(plain).isEmpty && plain.exceptAll(df).isEmpty,
      "bucketed and shuffled as-of must agree row-for-row")
  }

  test("filters above the as-of push into BOTH parquet scans") {
    import org.apache.spark.sql.catalyst.plans.logical.{Filter => LFilter, LeafNode}
    val df = AsOfJoinQueries.asofFiltered(spark, sf)
    df.collect()
    // structural assert (scan .toString truncates long PushedFilters
    // lists): each child subtree must hold a Filter DIRECTLY over its
    // relation carrying the user bound — from there FileSourceStrategy
    // turns it into the scan's pushed filter at physical planning
    val asof = df.queryExecution.optimizedPlan.collect {
      case a: graft.plans.AsOfJoinPlan => a
    }.head
    def boundOverRelation(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      p.collect {
        case f: LFilter if f.child.isInstanceOf[LeafNode] &&
          f.condition.toString.contains(s"<= ${AsOfJoinQueries.FilterMaxUser}") => f
      }.nonEmpty
    assert(boundOverRelation(asof.left),
      s"left scan must carry the user bound:\n${asof.left}")
    assert(boundOverRelation(asof.right),
      s"key-pruned right scan must carry the user bound:\n${asof.right}")
    // no Filter may remain parked above the as-of node
    val parked = df.queryExecution.optimizedPlan.collect {
      case f: LFilter if f.child.isInstanceOf[graft.plans.AsOfJoinPlan] => f
    }
    assert(parked.isEmpty, "pushdown rule must consume the left-only filter")
  }

  test("pushdown kill-switch: same rows with the rule on and off") {
    val on = AsOfJoinQueries.asofFiltered(spark, sf).collect().toSeq
    spark.conf.set(graft.plans.PushFilterThroughAsOf.EnabledKey, "false")
    try {
      val df = AsOfJoinQueries.asofFiltered(spark, sf)
      val parked = df.queryExecution.optimizedPlan.collect {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter
          if f.child.isInstanceOf[graft.plans.AsOfJoinPlan] => f
      }
      assert(parked.nonEmpty, "with the rule off the filter stays above the node")
      assert(df.collect().toSeq === on, "pushdown must be result-invariant")
    } finally spark.conf.unset(graft.plans.PushFilterThroughAsOf.EnabledKey)
  }

  test("time-only and right-side predicates are handled soundly") {
    val l = ticks((1L, 10L, "a"), (1L, 20L, "b"), (2L, 7L, "c"))
    val r = quotes((1L, 6L, 1.0), (1L, 15L, 3.0), (2L, 7L, 4.0))
    // time-only predicate: pushes LEFT only — the t=20 tick still matches
    // the t=15 quote even though 15 fails the left bound
    val timeFiltered = AsOfJoin.asofLeft(l, r, "k", "t", "qk", "qt")
      .filter($"t" >= 20L)
      .select($"k", $"t", $"px").collect()
      .map(row => (row.getLong(0), row.getLong(1), row.getDouble(2))).toSet
    assert(timeFiltered === Set((1L, 20L, 3.0)))
    // right-side predicate: must stay post-join (unmatched rows filtered
    // AFTER nulls appear)
    val rightFiltered = AsOfJoin.asofLeft(l, r, "k", "t", "qk", "qt")
      .filter($"px" > 2.0)
      .select($"tag").collect().map(_.getString(0)).toSet
    assert(rightFiltered === Set("b", "c"))
  }

  test("column pruning reaches through the as-of node (generic fallback)") {
    // Catalyst's ColumnPruning generic case prunes ANY node's children by
    // its references — pin that it keeps working for AsOfJoinPlan, since a
    // regression here silently re-widens every child scan at 100 TB
    val ev = Tables.events(spark, sf).filter($"ts".isNotNull)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_uid"), unix_micros($"ts").as("c_us"),
        $"event_id".as("click_id"), $"value".as("c_value"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"), $"value")
    val df = AsOfJoin.asofLeft(purchases, clicks,
        "user_id", "p_us", "c_uid", "c_us")
      .select($"event_id", $"click_id")
    val asof = df.queryExecution.optimizedPlan.collect {
      case a: graft.plans.AsOfJoinPlan => a
    }.head
    val childCols = (asof.left.output ++ asof.right.output).map(_.name).toSet
    assert(!childCols.contains("value") && !childCols.contains("c_value"),
      s"unused value columns must be pruned below the node, kept: $childCols")
  }

  test("compound-key as-of over tables bucketed on the key PREFIX: zero exchanges") {
    // HashPartitioning(user_id) satisfies ClusteredDistribution(user_id,
    // day) — rows sharing the full compound key are co-located by the
    // prefix alone — so bucketing by the coarse key serves every
    // finer-keyed as-of, provided the in-bucket sort covers (keys…, time).
    // CAVEAT the knob: co-partitioned binary nodes additionally require
    // the FULL clustering as partition keys unless
    // spark.sql.requireAllClusterKeysForCoPartition is off (a skew
    // safety default) — the deployment flips it when dims are bucketed
    // on stable coarse keys, exactly this layout.
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
    val ev = Tables.events(spark, sf).filter($"ts".isNotNull)
    val day = AsOfJoinQueries.DayUs
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
      .select($"user_id".as("c_uid"), unix_micros($"ts").as("c_us"), $"click_id")
      .withColumn("c_day", expr(s"c_us DIV $day"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
      .withColumn("p_day", expr(s"p_us DIV $day"))
    warehouse.Bucketing.writeBucketedSorted(purchases,
      "asof_purch_ck", "user_id", 4, Seq("user_id", "p_day", "p_us"))
    warehouse.Bucketing.writeBucketedSorted(clicks,
      "asof_clicks_ck", "c_uid", 4, Seq("c_uid", "c_day", "c_us"))
    val df = AsOfJoin.asofLeftKeys(spark.table("asof_purch_ck"),
      spark.table("asof_clicks_ck"),
      Seq("user_id", "p_day"), "p_us", Seq("c_uid", "c_day"), "c_us")
    df.collect()
    val shuffles = collectAll(df.queryExecution.executedPlan) {
      case s: ShuffleExchangeLike => s
    }
    assert(shuffles.isEmpty,
      s"prefix-bucketed compound-key as-of must plan zero exchanges:\n" +
        df.queryExecution.executedPlan)
    val plain = AsOfJoin.asofLeftKeys(purchases, clicks,
      Seq("user_id", "p_day"), "p_us", Seq("c_uid", "c_day"), "c_us")
    assert(df.exceptAll(plain).isEmpty && plain.exceptAll(df).isEmpty)
    } finally
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
  }

  test("AQE over a skewed key: results match AQE-off, reads coalesce, " +
      "skew-split never fires on the as-of exchanges") {
    import org.apache.spark.sql.execution.adaptive.AQEShuffleReadExec
    import org.apache.spark.sql.execution.{CoalescedPartitionSpec, PartialReducerPartitionSpec}
    // 80 % of rows share one hot key — the shape AQE's skew-join splitter
    // targets. A skew-split on an as-of exchange would break the merge
    // invariant (a key's rows divided across readers lose per-partition
    // completeness); the splitter only rewrites SortMergeJoin/
    // ShuffledHashJoin, so the custom exec must come through whole.
    val n = 20000
    val l = (1 to n).map { i =>
      (if (i % 5 != 0) 7L else (i % 50).toLong, i.toLong * 2, i)
    }.toDF("k", "t", "v")
    val r = (1 to n / 2).map { i =>
      (if (i % 5 != 0) 7L else (i % 50).toLong, i.toLong * 2 + 1, i.toDouble)
    }.toDF("qk", "qt", "px")
    def result(): Seq[(Long, Long, Int, Double)] =
      AsOfJoin.asofLeft(l, r, "k", "t", "qk", "qt")
        .select($"k", $"t", $"v", coalesce($"px", lit(-1.0)).as("px"))
        .orderBy($"k", $"t", $"v")
        .as[(Long, Long, Int, Double)].collect().toSeq
    val conf = spark.conf
    val saved = Seq("spark.sql.adaptive.enabled",
      "spark.sql.adaptive.skewJoin.enabled",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes")
      .map(k => k -> conf.getOption(k))
    try {
      conf.set("spark.sql.adaptive.enabled", "false")
      val baseline = result()
      conf.set("spark.sql.adaptive.enabled", "true")
      // make the splitter maximally eager: any partition over 2 KB and
      // 1x the median is "skewed" — if the rule COULD touch the as-of
      // exchanges, these settings would make it
      conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0")
      conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "2KB")
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2KB")
      val df = AsOfJoin.asofLeft(l, r, "k", "t", "qk", "qt")
        .select($"k", $"t", $"v", coalesce($"px", lit(-1.0)).as("px"))
      df.collect() // finalize the adaptive plan
      val p = df.queryExecution.executedPlan
      assert(collectAll(p) { case e: AsOfJoinExec => e }.size === 1)
      val reads = collectAll(p) { case a: AQEShuffleReadExec => a }
      assert(reads.flatMap(_.partitionSpecs).collect {
          case s: PartialReducerPartitionSpec => s }.isEmpty,
        "a skew-split read under an as-of exchange corrupts the merge " +
          s"invariant — none may appear:\n$p")
      val withAqe = result()
      assert(withAqe === baseline,
        "as-of results must be identical with and without AQE")
      // and with a generous advisory size the runtime DOES coalesce the
      // tiny shuffle partitions — proving the exec accepts AQE reads
      conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "64MB")
      val df2 = AsOfJoin.asofLeft(l, r, "k", "t", "qk", "qt")
        .select($"k", $"t", $"v")
      df2.collect()
      val reads2 = collectAll(df2.queryExecution.executedPlan) {
        case a: AQEShuffleReadExec => a }
      assert(reads2.nonEmpty &&
          reads2.forall(_.partitionSpecs.forall(
            _.isInstanceOf[CoalescedPartitionSpec])),
        "coalesced (whole-partition) AQE reads are the allowed rewrite")
    } finally saved.foreach { case (k, v) =>
      v.fold(conf.unset(k))(conf.set(k, _)) }
  }

  test("amplified skew ledger arms are row-identical (exec ≡ window form)") {
    // the bench asof_skew ledger prices these two plans against each other
    // WITHOUT a DuckDB oracle (the ×50 amplification would cost the oracle
    // run dearly) — so their equivalence is pinned here instead, at
    // sf0.001, sorted both sides
    val dir = "/root/testdata/sf0.001"
    val a = AsOfJoinQueries.asofSkewExecAmp(spark, dir)
      .orderBy($"event_id").collect().map(_.toString).toSeq
    val b = AsOfJoinQueries.asofSkewWindowAmp(spark, dir)
      .orderBy($"event_id").collect().map(_.toString).toSeq
    assert(a.nonEmpty, "amplified feed must produce rows")
    assert(a === b, "native exec and window composition must agree row-for-row")
  }

  test("exec survives skewed co-partitioning (all rows one key)") {
    val n = 5000
    val l = (1 to n).map(i => (7L, i.toLong * 2, s"e$i")).toDF("k", "t", "tag")
    val r = (0 until n).map(i => (7L, i.toLong * 2 + 1, i.toDouble)).toDF("qk", "qt", "px")
    val out = AsOfJoin.asofLeft(l, r, "k", "t", "qk", "qt")
      .agg(count(lit(1)), sum($"px")).collect().head
    assert(out.getLong(0) === n.toLong)
    // left t=2i matches quote t=2i-1 (px=i-1): sum = 0+1+...+(n-1)
    assert(out.getDouble(1) === (n.toLong - 1) * n / 2.0)
  }
}
