package graft

import graft.analytics.Queries
import org.apache.spark.sql.functions._

/** Structural invariants of the analytics queries (the value-level check is
  * the driver's DuckDB oracle; these pin the operator semantics).
  */
class QueriesSpec extends SparkSpec {
  import spark.implicits._

  test("q02: at most 5 diagnoses per age group, ranked by count desc (W1 top-k)") {
    val rows = Queries.q02TopDiagnosesByAgeGroup(spark, sf).collect()
    val byGroup = rows.groupBy(_.getString(0))
    assert(byGroup.values.forall(_.length <= 5))
    byGroup.values.foreach { g =>
      val counts = g.map(_.getLong(3))
      assert(counts.sameElements(counts.sortBy(-_)), "counts descending within group")
    }
  }

  test("q04: single grand-total row with consistent ratio (A4/A9)") {
    val r = Queries.q04PatientUtilization(spark, sf).collect()
    assert(r.length == 1)
    val row = r.head
    val patients = row.getLong(0); val encounters = row.getLong(1)
    assert(patients > 0 && encounters >= patients)
  }

  test("q05: exactly the two day types (F2)") {
    val types = Queries.q05WeekendVsWeekday(spark, sf)
      .select($"day_type").as[String].collect().toSet
    assert(types == Set("Weekend", "Weekday"))
  }

  test("q06: percentages sum to ~100 (W3 percent-of-total)") {
    val total = Queries.q06Demographics(spark, sf)
      .agg(sum($"percentage")).head().getDouble(0)
    assert(math.abs(total - 100.0) < 0.5, s"sum of pct = $total")
  }

  test("q09: pairs are ordered (d1 < d2) and meet the HAVING threshold (J5/A6)") {
    val rows = Queries.q09DiagnosisCooccurrence(spark, sf).collect()
    rows.foreach { r => assert(r.getLong(4) >= 10, "co-occurrence >= 10") }
    // pair dedup: (a,b) ordered by numeric diagnosis_key, so the mirrored
    // (b,a) pair must never also appear
    val pairs = rows.map(r => (r.getString(0), r.getString(2))).toSet
    assert(pairs.forall { case (a, b) => a != b && !pairs.contains((b, a)) })
  }

  test("q10: lag links each quarter to the previous row's encounters (W2)") {
    val rows = Queries.q10QuarterlyGrowth(spark, sf)
      .orderBy($"year", $"quarter").collect()
    rows.sliding(2).foreach {
      case Array(prev, cur) =>
        assert(cur.getLong(5) == prev.getLong(2),
          "previous_quarter_encounters == previous row's encounters")
      case _ =>
    }
    assert(rows.headOption.forall(_.isNullAt(5)), "first quarter has no lag")
  }

  test("q11: completion rate is within [0,100] (A7/F11)") {
    Queries.q11ReportsCoverage(spark, sf).collect().foreach { r =>
      val rate = r.getDouble(4)
      assert(rate >= 0 && rate <= 100)
    }
  }

  test("approx aggregates: sketches land within documented error of exact") {
    val rows = graft.analytics.WindowExtras.approxStats(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[Boolean]("approx_distinct_ok")))
    assert(rows.forall(_.getAs[Boolean]("p50_ok")))
    // raw sketch error (the checked query exports only the contract bools)
    val raw = Tables.events(spark, sf).groupBy($"event_type").agg(
      countDistinct($"user_id").as("e"),
      approx_count_distinct($"user_id", 0.01).as("a")).collect()
    assert(raw.forall { r =>
      math.abs(r.getAs[Long]("a") - r.getAs[Long]("e")) <=
        math.max(r.getAs[Long]("e") * 0.05, 1.0)
    })
  }

  test("as-of attribution: every purchase once, matched click at-or-before") {
    val df = graft.analytics.WindowExtras.asofClickAttribution(spark, sf)
    val rows = df.collect()
    val nPurchases = Tables.events(spark, sf)
      .filter($"event_type" === "purchase").count()
    assert(rows.length == nPurchases, "left semantics: one row per purchase")
    assert(rows.forall { r =>
      r.isNullAt(r.fieldIndex("prior_click_ts")) ||
        !r.getTimestamp(r.fieldIndex("prior_click_ts"))
          .after(r.getTimestamp(r.fieldIndex("ts")))
    }, "matched click must not be later than the purchase")
  }

  test("banded range join: total and exclusive over the tier partition") {
    val df = graft.analytics.WindowExtras.rangeBandJoin(spark, sf)
    // tiers partition the value domain: every event lands in exactly one
    val n = Tables.events(spark, sf)
      .filter($"value" >= 0.0 && $"value" < 100.01).count()
    assert(df.count() == n)
    assert(df.groupBy($"event_id").count().filter($"count" > 1).count() == 0)
  }

  test("heavy hitters: 10 rows, sketch contract holds, exact counts real") {
    val rows = graft.analytics.WindowExtras.heavyHitters(spark, sf).collect()
    assert(rows.length == 10)
    assert(rows.forall(_.getAs[Boolean]("cms_ok")))
    val top = Tables.events(spark, sf).groupBy($"user_id").count()
      .orderBy($"count".desc, $"user_id").limit(10).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).sameElements(top))
  }

  test("approx profile: no expand, nulls exact, distincts within 5% of exact") {
    import graft.ingest.Ingest
    val exact = Ingest.profile(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3))).toMap
    val approx = Ingest.profile(spark, sf, approxDistinct = true)
    assert(!approx.queryExecution.executedPlan.toString.contains("Expand"),
      "HLL form must not expand input rows")
    approx.collect().foreach { r =>
      val (nullsExact, distExact) = exact(r.getString(0))
      assert(r.getLong(2) == nullsExact, s"${r.getString(0)}: null count must stay exact")
      assert(math.abs(r.getLong(3) - distExact) <= math.max(distExact * 0.05, 1.0),
        s"${r.getString(0)}: sketch outside 5% of $distExact")
    }
  }

  test("rolling actives: window dominates daily, spot-day equals brute force") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val r = analytics.WindowExtras.rollingActiveUsers(spark, sf).cache()
    assert(r.filter($"n_active_7d" < $"n_active_1d").count() == 0)
    // brute-force one day: distinct users with any event in [day-6, day]
    val probe = r.orderBy($"day".desc).head
    val day = probe.getDate(0)
    val brute = Tables.events(spark, sf)
      .filter(to_date($"ts").between(date_sub(lit(day), 6), lit(day)))
      .select($"user_id").distinct().count()
    assert(probe.getLong(2) == brute)
  }

  test("peak concurrency equals the quadratic interval-overlap maximum") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    // with inclusive ends, max overlap is attained at some interval START,
    // so probing starts only is exhaustive — the O(n²) twin of the sweep
    val iv = Tables.events(spark, sf).filter($"ts".isNotNull)
      .groupBy(to_date($"ts").as("day"), $"user_id")
      .agg(min($"ts").as("s"), max($"ts").as("e"))
    val brute = iv.select($"day", $"s".as("t")).as("p")
      .join(iv.as("i"), col("p.day") === col("i.day")
        && col("i.s") <= col("p.t") && col("p.t") <= col("i.e"))
      .groupBy(col("p.day").as("day"), col("p.t"))
      .agg(count(lit(1)).as("c"))
      .groupBy($"day").agg(max($"c").as("peak"))
    val got = analytics.WindowExtras.maxConcurrency(spark, sf)
    assert(got.count() == brute.count())
    assert(got.join(brute, "day")
      .filter($"peak_concurrent" =!= $"peak").count() == 0)
  }

  test("KMV overlap: sketch estimates track the exact set overlaps") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val k = analytics.WindowExtras.KmvK
    val got = analytics.WindowExtras.kmvOverlap(spark, sf).collect()
    val sets = Tables.events(spark, sf)
      .select($"event_type", $"user_id").distinct().collect()
      .groupBy(_.getString(0))
      .map { case (t, rs) => t -> rs.map(_.get(1).toString).toSet }
    val nTypes = sets.size
    assert(got.length == nTypes * (nTypes - 1) / 2)
    got.foreach { r =>
      val (x, y) = (r.getString(0), r.getString(1))
      val (sa, sb) = (sets(x), sets(y))
      val union = (sa ++ sb).size
      val jExact = (sa & sb).size.toDouble / union
      val (jKmv, uEst) = (r.getDouble(4), r.getDouble(5))
      assert(jKmv >= 0.0 && jKmv <= 1.0, s"($x,$y): j_kmv=$jKmv")
      // k=32 ⇒ σ_J = √(j(1−j)/k) ≤ 0.089; a 3σ+ bound still catches any
      // kernel breakage (wrong slice, wrong hash, truncated merge)
      assert(math.abs(jKmv - jExact) <= 0.3,
        s"($x,$y): j_kmv=$jKmv vs exact=$jExact")
      assert(math.abs(uEst - union) <= math.max(0.6 * union, 2.0),
        s"($x,$y): union_est=$uEst vs exact=$union")
      if (sa.size < k && sb.size < k)
        assert(uEst == union.toDouble,
          s"($x,$y): unsaturated union must be exact")
    }
  }

  test("pagerank: distributed ranks equal a driver-side replay of the integer recurrence") {
    import spark.implicits._
    val G = analytics.GraphOps
    val edges = G.tradeEdges(spark, sf).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getLong(2)))
    val ow = edges.groupBy(_._1).map { case (s, es) => s -> es.map(_._3).sum }
    val nations = Tables.nation(spark, sf)
      .select($"n_nationkey", $"n_name").collect()
      .map(r => r.getInt(0) -> r.getString(1)).toMap
    var ranks: Map[Int, Long] = nations.keys.map(_ -> G.Scale).toMap
    for (_ <- 1 to G.Iterations) {
      val cin = edges.groupBy(_._2).map { case (d, es) =>
        d -> es.map { case (s, _, w) => ranks(s) * w / ow(s) }.sum
      }
      ranks = nations.keys.map(v =>
        v -> (G.BaseNum * G.Scale / 100L
          + G.DampNum * cin.getOrElse(v, 0L) / 100L)).toMap
    }
    val got = G.pagerank(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got.size == nations.size)
    for ((v, name) <- nations)
      assert(got(name) == ranks(v), s"$name: ${got(name)} != ${ranks(v)}")
    // mass check: total ≤ n (leak only via dangling truncation), ≥ base mass
    val total = ranks.values.sum
    assert(total <= nations.size * G.Scale
      && total >= nations.size * G.BaseNum * G.Scale / 100L)
  }

  test("triangles: degree-ordered counts equal a driver-side brute force") {
    val G = analytics.GraphOps
    val edges = G.coEdges(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val adj = (u: Long, v: Long) =>
      edges((u min v, u max v)) // coEdges normalizes u < v
    val brute = scala.collection.mutable.Map.empty[Long, Long]
    for {
      Seq(a, b, c) <- nodes.combinations(3)
      if adj(a, b) && adj(a, c) && adj(b, c)
      n <- Seq(a, b, c)
    } brute(n) = brute.getOrElse(n, 0L) + 1
    val got = G.triangles(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    assert(got == brute.toMap,
      s"per-node triangle counts differ: got ${got.size} nodes, want ${brute.size}")
    // sf0.001's 10-supplier graph is complete at the co-occurrence
    // threshold, so the expectation is known in closed form too
    if (edges.size == nodes.size * (nodes.size - 1) / 2)
      assert(brute.values.forall(_ == (nodes.size - 1).toLong * (nodes.size - 2) / 2))
  }

  test("snapshot diff: ledger matches the mutation gates exactly") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val diff = ingest.Ingest.snapshotDiff(spark, sf)
    val byType = diff.groupBy($"change_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val gate = substring(md5(concat(lit("snap:"), $"doc_id".cast("string"))), 1, 1)
    val gates = Tables.documents(spark, sf)
      .groupBy(gate.as("g")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // every mutated gate population lands in exactly its diff class
    assert(byType.getOrElse("added", 0L) == gates.getOrElse("1", 0L))
    assert(byType.getOrElse("removed", 0L) == gates.getOrElse("f", 0L))
    assert(byType.getOrElse("changed", 0L) == gates.getOrElse("0", 0L))
    assert(!byType.contains("unchanged"))
  }

  test("cdc apply: deletes retract, latest change wins, untouched rows kept") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val applied = ingest.Ingest.cdcApply(spark, sf)
    val ops = applied.groupBy($"last_op").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(Set("KEPT", "U", "I").subsetOf(ops.keySet) && !ops.contains("D"))
    // a seq-1 delete with no seq-2 re-insert is gone from the result
    val deleted = applied.filter($"event_id" % 10 === 0 && $"event_id" % 7 =!= 0)
    assert(deleted.count() == 0)
    // keys hit by both batches resolve to the seq-2 insert (latest wins)
    val both = applied.filter($"event_id" % 35 === 0)
    assert(both.count() > 0)
    assert(both.filter($"last_op" =!= "I" || $"event_type" =!= "cdc_insert")
      .count() == 0)
    // KEPT rows are bit-identical to the snapshot they came from
    val kept = applied.filter($"last_op" === "KEPT")
      .select($"event_id", $"user_id", $"event_type", $"value")
    val snap = Tables.events(spark, sf)
      .filter($"event_id" % 3 =!= 0 && $"event_id" % 5 =!= 0 &&
        $"event_id" % 7 =!= 0)
      .select($"event_id", $"user_id", $"event_type", $"value")
    assert(kept.exceptAll(snap).count() == 0 && snap.exceptAll(kept).count() == 0)
  }

  test("forget-users purge: conservation and emptiness") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val total = Tables.events(spark, sf).count()
    val ledger = ingest.Ingest.forgetUsers(spark, sf)
    val purgedTotal = ledger.agg(sum($"n_events_purged")).head().getLong(0)
    val remaining = ingest.Ingest.purgedEvents(spark, sf)
    // nothing lost, nothing duplicated: survivors + tombstoned = original
    assert(remaining.count() + purgedTotal == total)
    // no forgotten subject survives the purge
    val forgotten = ledger.select($"user_id")
    assert(remaining.join(forgotten, Seq("user_id"), "left_semi").count() == 0)
    assert(ledger.count() > 0, "the md5 gate must select some subjects")
  }

  test("readme record counts: all four entity tables non-empty (U1)") {
    val counts = Queries.readmeRecordCounts(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.keySet == Set("patients", "encounters", "procedures", "diagnoses"))
    assert(counts.values.forall(_ > 0))
  }
}
