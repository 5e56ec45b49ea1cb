package graft

import org.apache.spark.sql.functions._

/** Semantic pins for the round-5 operators: segment-level dedup, edit
  * verification, entropy, autocorrelation, lift/attribution readouts, and
  * the distribution-drift screens. Each test asserts an algebraic invariant
  * the oracle hash can't express (the hash proves engine parity; these
  * prove the operator computes the *right thing*).
  */
class DriftScoringSpec extends SparkSpec
    with org.scalatest.BeforeAndAfterAll {
  import spark.implicits._

  // the per-test .cache() calls are session-global: left in place they make
  // PlanSpec's later plan(...) calls resolve to InMemoryTableScan and turn
  // its join-shape assertions vacuous — drop them when this suite is done
  override def afterAll(): Unit = spark.catalog.clearCache()

  test("segment dedup: every re-keyed duplicate doc keeps zero segments") {
    val ledger = dedup.SegmentDedup.segmentExact(spark, sf).cache()
    val copies = ledger.filter($"doc_id" >= 1000000L)
    assert(copies.count() > 0)
    // the original's (doc_id, start) key is always smaller, so a full-copy
    // doc can never own a canonical occurrence
    assert(copies.filter($"n_kept" > 0).count() === 0)
    // conservation: kept occurrences == distinct segment fingerprints
    val kept = ledger.agg(sum($"n_kept")).as[Long].first()
    val total = ledger.agg(sum($"n_segments")).as[Long].first()
    assert(kept > 0 && kept < total)
  }

  test("edit verify: every planted full copy surfaces with distance zero") {
    val pairs = dedup.SegmentDedup.editVerify(spark, sf).cache()
    val planted = pairs
      .filter($"doc_b" === $"doc_a" + 1000000L && $"dist" === 0)
      .count()
    val expected = Tables.documents(spark, sf)
      .filter(pmod($"doc_id", lit(10)) === 0).count()
    assert(planted === expected)
    // similarity is a true normalization: within (0, 1]
    assert(pairs.filter($"edit_sim" > 1.0 || $"edit_sim" <= 0.0).count() === 0)
  }

  test("entropy is bounded by log of the type count and ttr is a ratio") {
    val e = text.Entropy.tokenEntropy(spark, sf).cache()
    // every document survives the ln-table inner joins (counts within
    // MaxCount headroom), and the table has 4x slack over the live maximum
    assert(e.count() === Tables.documents(spark, sf).count())
    val maxN = e.agg(max($"n_tokens")).as[Long].first()
    assert(maxN * 4 <= text.Entropy.MaxCount,
      s"ln table headroom eroded: max n_tokens=$maxN")
    assert(e.filter($"entropy_nats" < -1e-9).count() === 0)
    // H <= ln(n_types); rounding slack 1e-4 on the 4-dp column
    assert(e.filter($"entropy_nats" > log($"n_types") + 1e-4).count() === 0)
    assert(e.filter($"ttr" <= 0.0 || $"ttr" > 1.0).count() === 0)
  }

  test("autocorrelation coefficients live in [-1, 1]") {
    val a = analytics.TimeSeries.autocorr(spark, sf).cache()
    assert(a.count() > 0)
    for (c <- Seq("acf_1", "acf_7"))
      assert(a.filter(abs(col(c)) > 1.0 + 1e-12).count() === 0, c)
  }

  test("lift curve: deciles partition customers and capture ends at 1") {
    val lc = analytics.Scoring.liftCurve(spark, sf).cache()
    assert(lc.count() === 10)
    val nCust = Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(lc.agg(sum($"n")).as[Long].first() === nCust)
    val lastCapture = lc.orderBy($"decile".desc)
      .select($"cum_capture").as[Double].first()
    assert(math.abs(lastCapture - 1.0) < 1e-12)
  }

  test("attribution: shares sum to one and credit never exceeds the pool") {
    val at = analytics.Scoring.multitouch(spark, sf).cache()
    val shareSum = at.agg(sum($"credit_share")).as[Double].first()
    assert(math.abs(shareSum - 1.0) < 1e-9)
    // total credit <= conversions * scale (floor remainders only shrink it)
    val credit = at.agg(sum($"credit_millionths")).as[Long].first()
    val nConv = Tables.events(spark, sf)
      .filter($"event_type" === "purchase" && $"ts".isNotNull &&
        $"user_id".isNotNull).count()
    assert(credit <= nConv * analytics.Scoring.CreditScale)
  }

  test("benford screen: nine digits, observed shares sum to one") {
    val b = ingest.DriftChecks.benford(spark, sf).cache()
    assert(b.count() === 9)
    assert(b.select($"digit").as[Int].collect().sorted.toSeq === (1 to 9))
    val s = b.agg(sum($"observed_share")).as[Double].first()
    assert(math.abs(s - 1.0) < 1e-3) // 4-dp rounding slack * 9 rows
  }

  test("psi drift: running total is the sum of the terms") {
    val p = ingest.DriftChecks.psiDrift(spark, sf).cache()
    assert(p.count() === ingest.DriftChecks.PsiBuckets.toLong)
    val termSum = p.agg(sum($"psi_term")).as[Double].first()
    val lastRunning = p.orderBy($"bucket".desc)
      .select($"psi_running").as[Double].first()
    assert(math.abs(termSum - lastRunning) < 1e-4)
    // smoothed shares are proper distributions
    for (c <- Seq("expected_share", "actual_share")) {
      val t = p.agg(sum(col(c))).as[Double].first()
      assert(math.abs(t - 1.0) < 1e-3, c)
    }
  }

  test("t-closeness: distances are probabilities and leak counts bounded") {
    val t = privacy.Privacy.tCloseness(spark, sf).cache()
    assert(t.count() > 0)
    assert(t.filter($"max_t" < 0.0 || $"max_t" > 1.0).count() === 0)
    assert(t.filter($"n_leaky_classes" > $"n_classes").count() === 0)
  }

  test("matryoshka report: one row per prefix, rates are probabilities") {
    val m = similarity.Matryoshka.prefixReport(spark, sf).cache()
    assert(m.select($"prefix_dim").as[Int].collect().sorted.toSeq ===
      similarity.Matryoshka.PrefixDims.sorted)
    assert(m.filter($"top1_agreement" < 0.0 || $"top1_agreement" > 1.0)
      .count() === 0)
    assert(m.filter(col(s"recall_at_${similarity.Similarity.TopK}") < 0.0 ||
      col(s"recall_at_${similarity.Similarity.TopK}") > 1.0).count() === 0)
    assert(m.filter($"n_probes" =!= similarity.Similarity.NumProbes)
      .count() === 0)
  }

  test("dp release: noise table tiles [0, 2^32) and noise is bounded") {
    // pure-Scala mechanism audit: contiguous intervals, full coverage
    val iv = privacy.DpRelease.NoiseIntervals
    assert(iv.head._1 === 0L)
    assert(iv.last._2 === 4294967295L)
    iv.sliding(2).foreach { case Seq((_, hi, _), (lo, _, _)) =>
      assert(lo === hi + 1)
    }
    val d = privacy.DpRelease.dpCounts(spark, sf).cache()
    assert(d.count() > 0)
    assert(d.filter(abs($"noise") > privacy.DpRelease.NoiseBound)
      .count() === 0)
    assert(d.filter($"released_count" =!=
      greatest($"true_count" + $"noise", lit(0L))).count() === 0)
  }

  test("value positions: leaders anchor the frame reads") {
    val v = analytics.ValuePositions.valuePositions(spark, sf).cache()
    assert(v.count() > 0)
    // the partition leader IS first_value and has percent_rank 0
    val leaders = v.filter($"o_orderkey" === $"leader_key")
    assert(leaders.count() > 0)
    assert(leaders.filter($"pct_rank" =!= 0.0).count() === 0)
    assert(v.filter($"runner_up_key" === $"leader_key").count() === 0)
    assert(v.filter($"cume" <= 0.0 || $"cume" > 1.0).count() === 0)
  }

  test("fk audit: clean testdata has zero orphans on every edge") {
    val fk = ingest.FkOrphans.orphanAudit(spark, sf).cache()
    assert(fk.count() === 7)
    assert(fk.filter($"n_orphans" =!= 0L).count() === 0)
    assert(fk.filter($"n_child_rows" <= 0L).count() === 0)
  }

  test("market basket: rules respect support floor and probability bounds") {
    val mb = analytics.MarketBasket.rules(spark, sf).cache()
    assert(mb.count() > 0)
    assert(mb.filter($"n_xy" < analytics.MarketBasket.MinSupport).count() === 0)
    assert(mb.filter($"confidence" <= 0.0 || $"confidence" > 1.0).count() === 0)
    assert(mb.filter($"support" <= 0.0 || $"support" > 1.0).count() === 0)
    assert(mb.filter($"lift" <= 0.0).count() === 0)
    // confidence(A->B) = support(AB)/support(A) >= support(AB)
    assert(mb.filter($"confidence" < $"support" - 1e-12).count() === 0)
  }

  test("top paths: trigram journeys with user counts bounded by hits") {
    val tp = analytics.EventSeq.topPaths(spark, sf).cache()
    assert(tp.count() > 0 &&
      tp.count() <= analytics.EventSeq.TopPathsK.toLong)
    assert(tp.filter($"n_users" > $"n").count() === 0)
    assert(tp.filter(size(split($"path", " > ")) =!= 3).count() === 0)
  }

  test("stl-lite: decomposition reassembles and residuals balance per dow") {
    val s = analytics.TimeSeries.stlLite(spark, sf).cache()
    assert(s.count() > 0)
    // x = trend + seasonal + residual (within the 4-dp rounding grid)
    val broken = s.filter(
      abs($"n" - ($"trend" + $"seasonal" + $"residual")) > 2e-4).count()
    assert(broken === 0)
    // seasonal indices are defined to zero the residual sum per dow group
    val groupSums = s
      .withColumn("dow", weekday($"d") + 1)
      .groupBy($"event_type", $"dow")
      .agg(sum($"residual").as("r"), count(lit(1)).as("m"))
    assert(groupSums.filter(abs($"r") > $"m" * 2e-4).count() === 0)
  }

  test("stream enrich: left join lands every event, unmatched at -1") {
    val e = streaming.IncrementalIngest.enrichEntry(spark, sf).cache()
    val total = e.agg(sum($"n_events")).as[Long].first()
    assert(total === Tables.events(spark, sf).count())
    // the dim deliberately omits "error": it must land with the sentinel
    assert(e.filter($"event_type" === "error" && $"weight" === -1)
      .count() === 1)
    assert(e.filter($"weight" === -1 &&
      $"event_type".isin(
        streaming.IncrementalIngest.EnrichWeights.map(_._1): _*))
      .count() === 0)
  }

  test("junk dimension: dense keys, distinct combos, conserved usage") {
    val j = warehouse.JunkDim.junkDimension(spark, sf).cache()
    val n = j.count()
    assert(j.select($"junk_key").as[Int].collect().sorted.toSeq ===
      (1 to n.toInt))
    assert(j.select($"order_status", $"order_priority", $"is_high_value")
      .distinct().count() === n)
    assert(j.agg(sum($"n_orders")).as[Long].first() ===
      Tables.orders(spark, sf).count())
  }

  test("centroid drift: cohorts partition each label and cosine is bounded") {
    val d = similarity.CentroidDrift.drift(spark, sf).cache()
    assert(d.count() > 0)
    assert(d.filter(abs($"centroid_cos") > 1.0 + 1e-6).count() === 0)
    val total = d.agg(sum($"n_even" + $"n_odd")).as[Long].first()
    assert(total === Tables.embeddings(spark, sf).count())
  }

  test("snaive backtest: error metrics agree with their integer numerators") {
    val b = analytics.TimeSeries.snaiveBacktest(spark, sf).cache()
    assert(b.count() > 0)
    assert(b.filter($"wape" < 0.0 || $"mae" < 0.0).count() === 0)
    assert(b.filter(
      abs($"mae" * $"n_days" - $"total_abs_err") > $"n_days" * 1e-4)
      .count() === 0)
  }

  test("release extract: every unsuppressed class clears K") {
    val r = privacy.Privacy.releaseExtract(spark, sf).cache()
    assert(r.count() === Tables.customer(spark, sf).count())
    // suppressed rows are actually masked
    assert(r.filter($"suppressed" &&
      ($"sex" =!= "*" || $"location" =!= "*")).count() === 0)
    // surviving (unmasked) QI classes all have >= K members in the release
    val small = r.filter(!$"suppressed")
      .groupBy($"age_group", $"sex", $"location").count()
      .filter($"count" < privacy.Privacy.K)
    assert(small.count() === 0)
    // pseudonyms are unique (stable 1:1 masking, no collisions)
    assert(r.select($"pseudo_id").distinct().count() === r.count())
  }

  test("bitmap distinct: occupancy undercounts exact, never exceeds width") {
    val b = analytics.BitmapRollup.bitmapDistinct(spark, sf).cache()
    assert(b.count() > 0)
    // hashing can only collide buckets: n_set <= exact, n_set <= bitmap bits
    assert(b.filter($"n_set" > $"exact_distinct").count() === 0)
    assert(b.filter($"n_set" > analytics.BitmapRollup.Buckets).count() === 0)
    assert(b.filter($"occupancy_ratio" <= 0.0 ||
      $"occupancy_ratio" > 1.0).count() === 0)
  }

  test("leakfree split: zero aware crossings, sides partition the corpus") {
    val r = dedup.DupClusters.leakfreeSplit(spark, sf).collect().head
    assert(r.getAs[Long]("aware_crossing_pairs") === 0L)
    assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_val") ===
      r.getAs[Long]("n_docs"))
    assert(r.getAs[Long]("naive_crossing_pairs") <=
      r.getAs[Long]("n_neardup_pairs"))
  }

  test("new-vs-returning: firsts conserve users and day one has no returns") {
    val nv = analytics.TimeSeries.newVsReturning(spark, sf).cache()
    val users = Tables.events(spark, sf)
      .filter($"ts".isNotNull && $"user_id".isNotNull)
      .select($"user_id").distinct().count()
    assert(nv.agg(sum($"n_new")).as[Long].first() === users)
    assert(nv.orderBy($"d").select($"n_returning").as[Long].first() === 0L)
    assert(nv.filter($"n_active" =!= $"n_new" + $"n_returning").count() === 0)
  }

  test("fixed-width roundtrip conserves the clean slice") {
    val fw = sources.Sources.fixedWidthIngest(spark, sf).cache()
    val clean = Tables.events(spark, sf)
      .filter($"event_id".isNotNull && $"user_id".isNotNull &&
        $"event_type".isNotNull && $"value".isNotNull)
    assert(fw.count() === clean.count())
    // cents arithmetic is exact through the byte layout
    val sumCents = fw.agg(sum($"value_cents")).as[Long].first()
    val expected = clean
      .agg(sum(($"value".cast("decimal(12,2)") * 100).cast("long")))
      .as[Long].first()
    assert(sumCents === expected)
  }

  test("pq distortion: assignments conserve subvectors and errors order") {
    val d = similarity.ProductQuantizer.distortion(spark, sf).cache()
    // every (vector, subspace) assigns exactly once: M * |corpus| total
    val total = d.agg(sum($"n_assigned")).as[Long].first()
    assert(total === similarity.ProductQuantizer.M *
      Tables.embeddings(spark, sf).count())
    assert(d.filter($"min_err" > $"max_err").count() === 0)
    assert(d.filter($"min_err" < 0.0).count() === 0)
    assert(d.filter($"mean_err" < $"min_err" - 1e-6 ||
      $"mean_err" > $"max_err" + 1e-6).count() === 0)
  }

  test("unpivot emits exactly the metric triple per month") {
    val u = analytics.Reshape.unpivotMonthly(spark, sf).cache()
    val perMonth = u.groupBy($"month").count()
    assert(perMonth.filter($"count" =!= 3).count() === 0)
    // revenue row equals the wide aggregate it melted from
    val months = Tables.orders(spark, sf)
      .select((year($"o_orderdate") * 100 + month($"o_orderdate")).cast("int"))
      .distinct().count()
    assert(u.count() === months * 3)
  }
}
