package graft

import org.apache.spark.sql.functions._

/** Invariants for the round-6 operators: RRF fusion, JL projection,
  * UniMax allocation, time travel/vacuum, and join-view IVM. The DuckDB
  * oracle pins their exact values; these pin the ALGEBRAIC properties the
  * oracle can't express (budget exhaustion, row conservation, distance
  * concentration).
  */
class Round6Spec extends SparkSpec {
  import spark.implicits._

  test("rrf: fused list covers both input lists, scores decrease") {
    val fused = similarity.RrfFusion.rrfFusion(spark, sf).collect()
    assert(fused.nonEmpty)
    // the PRF seed doc (lexical rank 1) must fuse at rank 1: it holds the
    // best lexical quotient and is excluded from the semantic list, but
    // 1/61 alone beats any single-list competitor's 1/(60+r), r>=2 — and
    // dual-listed docs that beat it would need sem+lex both near rank 1,
    // impossible while it holds lexical 1... so just assert it's present
    val seed = fused.find(_.getAs[Long]("lex_rank") == 1L)
    assert(seed.isDefined, "top lexical doc missing from fusion")
    val scores = fused.map(_.getAs[Double]("rrf_score")).toSeq
    assert(scores == scores.sorted.reverse, "rrf_score not descending")
    // every row retrieved by at least one list
    assert(fused.forall(r => r.getAs[Long]("lex_rank") > 0
      || r.getAs[Long]("sem_rank") > 0))
    // dual-listed rows score strictly above the best possible single-list
    // row at the same ranks
    fused.filter(r =>
        r.getAs[Long]("lex_rank") > 0 && r.getAs[Long]("sem_rank") > 0)
      .foreach { r =>
        val expect = 1.0 / (60 + r.getAs[Long]("lex_rank")) +
          1.0 / (60 + r.getAs[Long]("sem_rank"))
        assert(r.getAs[Double]("rrf_score") == expect)
      }
  }

  test("jl: projection matches a hand-computed fold; distortion concentrates") {
    val p0 = similarity.JlProjection.jlProject(spark, sf)
      .filter($"vec_id" === 0).collect()(0)
    val emb = Tables.embeddings(spark, sf)
      .filter($"vec_id" === 0).select($"embedding").as[Seq[Float]].head()
    // the spec recomputes coordinate 0 with the SAME fold order the column
    // expression uses — a changed sign matrix or fold order breaks this
    val expect = (0 until similarity.JlProjection.InDim)
      .map(i => emb(i).toDouble * similarity.JlProjection.sign(0, i))
      .reduce(_ + _) / 4.0
    assert(p0.getAs[Double]("p00") == expect)

    val bands = similarity.JlProjection.jlDistortion(spark, sf).collect()
    assert(bands.nonEmpty)
    val total = bands.map(_.getAs[Long]("n_pairs")).sum
    // JL with k=16, ±1 entries: ratio mean 1, var 2/k — the bulk of pairs
    // must land within [0.25, 2.5); a flat or shifted histogram means the
    // sign matrix is broken (e.g. all +1 would pile mass near 0 and 64/16)
    val bulk = bands.filter { r =>
      val b = r.getAs[Int]("ratio_band"); b >= 2 && b <= 24
    }.map(_.getAs[Long]("n_pairs")).sum
    assert(bulk * 10 >= total * 9,
      s"only $bulk/$total pairs within ratio [0.2, 2.5)")
    bands.foreach { r =>
      assert(r.getAs[Double]("min_ratio") >= r.getAs[Int]("ratio_band") / 10.0 - 1e-9)
      assert(r.getAs[Double]("max_ratio") <= r.getAs[Int]("ratio_band") / 10.0 + 0.1 + 1e-9)
    }
  }

  test("unimax: budget exhausted, caps respected, saturation is a prefix") {
    val rows = text.UniMaxMix.unimaxEpochs(spark, sf).collect()
    assert(rows.nonEmpty)
    val totalDocs = rows.map(_.getAs[Long]("n_docs")).sum
    val budget = totalDocs * text.UniMaxMix.BudgetMul
    val allocated = rows.map(_.getAs[Double]("allocated")).sum
    assert(math.abs(allocated - budget) < 1e-6 * budget,
      s"allocated $allocated != budget $budget")
    rows.foreach { r =>
      assert(r.getAs[Double]("allocated") <= r.getAs[Long]("cap") + 1e-9)
      assert(r.getAs[Double]("epochs") <= text.UniMaxMix.EpochCap + 1e-9)
    }
    // saturated domains form a prefix of the capacity order, and every
    // unsaturated domain gets the same water level
    val byCap = rows.sortBy(r => (r.getAs[Long]("cap"), r.getAs[String]("domain")))
    val satFlags = byCap.map(_.getAs[Int]("saturated"))
    assert(!satFlags.sliding(2).exists(w => w.length == 2 && w(0) == 0 && w(1) == 1),
      "saturation must be a prefix of the capacity order")
    val waters = rows.filter(_.getAs[Int]("saturated") == 0)
      .map(_.getAs[Double]("allocated")).distinct
    assert(waters.length <= 1, s"multiple water levels: ${waters.toSeq}")
  }

  test("time travel: compaction conserves rows; vacuum respects retention") {
    val tt = warehouse.TimeTravel.timeTravelRead(spark, sf)
      .orderBy($"version").collect()
    val m = tt.length - 2 // two compaction commits follow the year adds
    assert(m >= 4, s"need >=4 year commits, got $m")
    // adds accumulate rows; compactions must NOT change the total
    val rowsAt = tt.map(_.getAs[Long]("total_rows"))
    assert(rowsAt.take(m).toSeq == rowsAt.take(m).sorted.toSeq,
      "adds must accumulate")
    assert(rowsAt(m) == rowsAt(m - 1) && rowsAt(m + 1) == rowsAt(m - 1),
      "compaction changed the row total — a file was lost or double-counted")
    // each compaction nets one file fewer (2 removed, 1 added)
    val filesAt = tt.map(_.getAs[Long]("n_files"))
    assert(filesAt(m) == filesAt(m - 1) - 1 && filesAt(m + 1) == filesAt(m) - 1)

    val vac = warehouse.TimeTravel.vacuumPlan(spark, sf).collect()
    val vCur = m + 2L
    assert(vac.nonEmpty, "first compaction's inputs must be reclaimable")
    vac.foreach { r =>
      assert(r.getAs[Long]("remove_version") <=
        vCur - warehouse.TimeTravel.RetainVersions)
    }
    // the second compaction's inputs are inside the retention window —
    // they must NOT appear
    assert(vac.forall(_.getAs[Long]("remove_version") == m + 1L))
  }

  test("bpe train: compression monotone, merge counts non-increasing") {
    val ledger = text.BpeTrain.bpeTrain(spark, sf)
      .orderBy($"round").collect()
    assert(ledger.length == text.BpeTrain.Rounds)
    val toks = ledger.map(_.getAs[Long]("corpus_tokens_after"))
    assert(toks.zip(toks.tail).forall { case (a, b) => b < a },
      s"each merge must shrink the corpus: ${toks.toSeq}")
    val cnts = ledger.map(_.getAs[Long]("n_occurrences"))
    assert(cnts.zip(cnts.tail).forall { case (a, b) => b <= a },
      s"best-pair counts can only decay: ${cnts.toSeq}")
    ledger.foreach { r =>
      assert(r.getAs[String]("merged") ==
        r.getAs[String]("left_sym") + r.getAs[String]("right_sym"))
    }
  }

  test("lpa: labels partition the node set") {
    val comm = analytics.LpaCommunities.lpaCommunities(spark, sf).collect()
    assert(comm.nonEmpty)
    val nNodes = comm.map(_.getAs[Long]("n_nodes")).sum
    // nodes = nations present in the sparsified edge list; every one must
    // land in exactly one community (sum over a partition = total)
    assert(nNodes >= 20 && nNodes <= 25, s"unexpected node count $nNodes")
    comm.foreach { r =>
      assert(r.getAs[Long]("min_node") <= r.getAs[Long]("max_node"))
    }
  }

  test("binpack: bins tile the month range in order, no row lost") {
    val bins = warehouse.BinPack.binpackPlan(spark, sf)
      .orderBy($"bin").collect()
    assert(bins.nonEmpty)
    val total = Tables.orders(spark, sf).count()
    assert(bins.map(_.getAs[Long]("bin_rows")).sum == total)
    // layout order preserved: consecutive bins' month ranges never overlap
    bins.sliding(2).foreach {
      case Array(x, y) =>
        assert(x.getAs[Int]("ym_to") < y.getAs[Int]("ym_from"))
      case _ =>
    }
  }

  test("feature hash: buckets cover every row, collisions flagged") {
    val audit = text.FeatureHash.featureHash(spark, sf).collect()
    val nCust = Tables.customer(spark, sf).count()
    assert(audit.map(_.getAs[Long]("n_rows")).sum == 2 * nCust)
    audit.foreach { r =>
      assert(r.getAs[Long]("bucket") >= 0
        && r.getAs[Long]("bucket") < text.FeatureHash.Buckets)
      assert((r.getAs[Long]("n_categories") > 1) ==
        (r.getAs[Int]("collided") == 1))
      assert((r.getAs[String]("first_category") !=
        r.getAs[String]("last_category")) ==
        (r.getAs[Long]("n_categories") > 1))
    }
  }

  test("hadamard rotation preserves total energy (orthogonality)") {
    val rows = similarity.HadamardRotation.hadamardBalance(spark, sf).collect()
    assert(rows.length == 8)
    val before = rows.map(_.getAs[Double]("energy_before")).sum
    val after = rows.map(_.getAs[Double]("energy_after")).sum
    // H/8 is orthonormal, so total energy is invariant up to the
    // fixed-point floor (each of 64 dims × n rows floors away < 1/2^20)
    val tol = 64.0 * Tables.embeddings(spark, sf).count() /
      similarity.HadamardRotation.Scale + 1e-6
    assert(math.abs(before - after) <= tol,
      s"energy drifted: $before -> $after (tol $tol)")
    val shares = rows.map(_.getAs[Double]("share_after"))
    assert(math.abs(shares.sum - 1.0) < 1e-9)
  }

  test("expectations: suite green on clean data, red on planted violation") {
    val ledger = warehouse.Expectations.expectations(spark, sf).collect()
    assert(ledger.length == 6)
    assert(ledger.forall(_.getAs[Int]("pass") == 1),
      ledger.filter(_.getAs[Int]("pass") == 0)
        .map(_.getAs[String]("check")).mkString(", "))
    // the suite must be able to fail: a unique check over a table WITH
    // duplicates reports the duplicate count and pass=0
    val dup = Tables.orders(spark, sf).limit(100)
    val doubled = dup.unionByName(dup)
    val observed = doubled.agg(
      (count(lit(1)) - countDistinct($"o_orderkey")).as("v"))
      .as[Long].head()
    assert(observed == 100L)
  }

  test("outer stream join: inner results preserved, sentinels only added") {
    val outer = streaming.IncrementalIngest
      .outerAttributionEntry(spark, sf).collect()
    val inner = streaming.IncrementalIngest
      .attributionEntry(spark, sf).collect()
    val matched = outer.filter(_.getAs[Long]("click_id") != -1L)
    assert(matched.length == inner.length,
      s"outer join must not change the matched set: ${matched.length} vs ${inner.length}")
    val unmatched = outer.filter(_.getAs[Long]("click_id") == -1L)
    assert(unmatched.nonEmpty, "fixture has purchases without clicks")
    assert(unmatched.forall(_.getAs[Long]("click_t") == 0L))
  }

  test("rfm: quintile scores partition the customer base") {
    val cells = analytics.RfmSegments.rfmSegments(spark, sf).collect()
    val nCust = Tables.orders(spark, sf)
      .select($"o_custkey").distinct().count()
    assert(cells.map(_.getAs[Long]("n_customers")).sum == nCust)
    cells.foreach { c =>
      Seq("r_score", "f_score", "m_score").foreach { s =>
        val v = c.getAs[Int](s); assert(v >= 1 && v <= 5, s"$s=$v")
      }
    }
  }

  test("bigram novelty: shares in [0,1], review queue sorted") {
    val rows = text.BigramNovelty.bigramNovelty(spark, sf).collect()
    assert(rows.nonEmpty)
    val nov = rows.map(_.getAs[Double]("novelty"))
    assert(nov.forall(v => v >= 0.0 && v <= 1.0))
    assert(nov.toSeq == nov.sorted.reverse.toSeq)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_rare") <= r.getAs[Long]("n_bigrams"))
    }
  }

  test("graph beam search: valid walk, self excluded, some exact hits") {
    val rows = similarity.GraphSearch.graphGreedySearch(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val q = r.getAs[Long]("query_id")
      (1 to similarity.GraphSearch.Rounds).foreach { h =>
        assert(r.getAs[Long](s"hop$h") != q, s"walk visited its own query $q")
      }
      assert(r.getAs[Long]("exact_nn") != q)
    }
    // on the 50-vector corpus the beam must land at least some exact NNs —
    // zero hits means the graph expansion or the argmax is broken
    assert(rows.map(_.getAs[Int]("found_exact")).sum > 0)
  }

  test("nprobe sweep: recall and cost both monotone in nprobe") {
    val pts = similarity.IvfIndex.nprobeSweep(spark, sf)
      .orderBy($"nprobe").collect()
    assert(pts.length == similarity.IvfIndex.SweepNProbes.length)
    val recalls = pts.map(_.getAs[Double]("recall_at_k"))
    val costs = pts.map(_.getAs[Long]("scanned_rows"))
    assert(recalls.zip(recalls.tail).forall { case (a, b) => b >= a },
      s"recall must not drop as probes widen: ${recalls.toSeq}")
    assert(costs.zip(costs.tail).forall { case (a, b) => b > a },
      s"probing more cells must scan more rows: ${costs.toSeq}")
  }

  test("bitemporal: fuller knowledge can only add customers") {
    val rows = warehouse.Bitemporal.bitemporalAsof(spark, sf).collect()
    def total(label: String) = rows
      .filter(_.getAs[String]("asof_label") == label)
      .map(_.getAs[Long]("n_customers")).sum
    assert(total("restated") >= total("printed"),
      "a later knowledge date sees a superset of recorded rows")
    assert(total("printed") > 0)
  }

  test("skyline: frontier is an antichain no interior point beats") {
    val pts = analytics.Skyline.skylineFrontier(spark, sf)
      .orderBy($"frequency").collect()
    assert(pts.nonEmpty)
    // along the frontier, monetary must strictly DECREASE as frequency
    // increases — otherwise a point would dominate its neighbor
    val ms = pts.map(_.getAs[Double]("monetary"))
    assert(ms.zip(ms.tail).forall { case (a, b) => b < a },
      s"frontier not an antichain: ${ms.toSeq}")
    // no customer dominates any frontier point
    val cust = Tables.orders(spark, sf)
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("f"),
        sum($"o_totalprice".cast("decimal(18,2)")).cast("double").as("m"))
      .collect()
    pts.foreach { p =>
      val (f, m) = (p.getAs[Long]("frequency"), p.getAs[Double]("monetary"))
      assert(!cust.exists { c =>
        val (cf, cm) = (c.getAs[Long]("f"), c.getAs[Double]("m"))
        (cf >= f && cm >= m) && (cf > f || cm > m)
      }, s"frontier point (f=$f, m=$m) is dominated")
    }
  }

  test("filtered ann: postfilter starves, prefilter dominates recall") {
    val rows = similarity.FilteredAnn.filteredAnn(spark, sf).collect()
      .map(r => r.getAs[String]("method") -> r).toMap
    val pre = rows("prefilter")
    val post = rows("postfilter")
    // the filter eats into the unfiltered top-k, so postfilter can never
    // return MORE rows than prefilter, and its recall can't exceed it
    assert(post.getAs[Long]("n_results") <= pre.getAs[Long]("n_results"))
    assert(post.getAs[Double]("recall") <= pre.getAs[Double]("recall") + 1e-12)
    assert(pre.getAs[Long]("n_hits") <= pre.getAs[Long]("n_results"))
  }

  test("ivm join view: delta terms tile the direct recompute exactly") {
    val v = warehouse.IvmJoin.ivmJoinView(spark, sf)
    val direct = Tables.orders(spark, sf)
      .join(Tables.customer(spark, sf),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_direct"))
    val joined = v.join(direct, "nationkey").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      assert(r.getAs[Long]("n_orders") == r.getAs[Long]("n_direct"))
      assert(r.getAs[Long]("base_n") + r.getAs[Long]("new_order_n")
        + r.getAs[Long]("new_cust_n") + r.getAs[Long]("both_new_n")
        == r.getAs[Long]("n_orders"))
    }
    // the cross term must be non-trivial somewhere at sf0.001 or the
    // fixture isn't exercising the classic missing-term bug
    val crossTotal = v.agg(sum($"both_new_n")).as[Long].head()
    assert(crossTotal > 0, "ΔA⋈ΔB term empty — fixture too weak")
  }

  test("scaled ln: exact below table ceiling, <2^-10 nats error above") {
    import graft.functions.ScaledLn
    // exact region: table IS math.log
    for (x <- Seq(1L, 2L, 7L, 1023L, 2047L))
      assert(ScaledLn.lnS(x) ==
        math.rint(math.log(x.toDouble) * ScaledLn.Scale).toLong)
    // mantissa region: deterministic underestimate within ln(1+1/1024)
    val tol = math.log(1 + 1.0 / 1024) * ScaledLn.Scale + 1
    for (x <- Seq(2048L, 4097L, 123456L, 98765432L, 1L << 40, (1L << 55) + 17)) {
      val approx = ScaledLn.lnS(x)
      val exact = math.log(x.toDouble) * ScaledLn.Scale
      // the mantissa truncation UNDERSTATES; the only overshoot source is
      // the rounding of the two fixed-point constants (≤0.5 each, ×53
      // octaves worst case) — sub-picoNat noise, bounded by 32 units
      assert(approx <= exact + 32, s"lnS($x) overshoots")
      assert(exact - approx <= tol, s"lnS($x) error ${exact - approx}")
    }
    // monotone over a boundary-crossing sweep
    val sweep = (2040L to 2060L) ++ Seq(4095L, 4096L, 4097L)
    assert(sweep.map(ScaledLn.lnS) == sweep.map(ScaledLn.lnS).sorted)
  }

  test("dsir: quota exact, selected weights dominate unselected") {
    val rows = text.DsirWeights.dsirWeights(spark, sf).collect()
    assert(rows.nonEmpty)
    val nRaw = rows.length.toLong
    val sel = rows.filter(_.getAs[Long]("selected") == 1L)
    assert(sel.length.toLong == nRaw / text.DsirWeights.SelectDenom)
    val minSel = sel.map(_.getAs[Double]("log_weight")).min
    val maxUnsel = rows.filter(_.getAs[Long]("selected") == 0L)
      .map(_.getAs[Double]("log_weight")).max
    assert(minSel >= maxUnsel,
      s"selection not a weight-threshold cut: $minSel < $maxUnsel")
    // ranks are a permutation of 1..n_raw
    assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq == (1L to nRaw))
  }

  test("weak labels: conflict <= overlap <= coverage, lang LF total") {
    val rows = text.WeakLabels.weakLabels(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      val (cov, ov, cf) = (r.getAs[Double]("coverage"),
        r.getAs[Double]("overlaps"), r.getAs[Double]("conflicts"))
      // a conflict needs a disagreeing co-vote, an overlap any co-vote,
      // and both presuppose this LF voted at all
      assert(cf <= ov + 1e-12, s"${r.getAs[String]("lf_name")}: $cf > $ov")
      assert(ov <= cov + 1e-12, s"${r.getAs[String]("lf_name")}: $ov > $cov")
      // keep+drop tallies ARE the coverage numerator
      assert(r.getAs[Long]("n_keep") + r.getAs[Long]("n_drop") ==
        math.rint(cov * r.getAs[Long]("n_docs")).toLong)
    }
    // the language LF never abstains
    val lang = rows.find(_.getAs[String]("lf_name") == "lf_lang_en").get
    assert(lang.getAs[Double]("coverage") == 1.0)
    // the fixture must exercise actual disagreement or the audit is vacuous
    assert(rows.exists(_.getAs[Double]("conflicts") > 0))
  }

  test("k-center: radii non-increasing, occupancy tiles the corpus") {
    val rows = similarity.KCenterCoreset.kcenterCoreset(spark, sf)
      .collect().sortBy(_.getAs[Int]("round"))
    assert(rows.length == similarity.KCenterCoreset.Rounds + 1)
    // greedy farthest-point: each pick's covering radius can only shrink
    val radii = rows.drop(1).map(_.getAs[Double]("radius")).toSeq
    assert(radii == radii.sorted.reverse, s"radii not non-increasing: $radii")
    assert(radii.forall(_ > 0), "degenerate pick at distance 0")
    val centers = rows.map(_.getAs[Long]("center_id"))
    assert(centers.distinct.length == centers.length, "duplicate center")
    val corpus = Tables.embeddings(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_assigned")).sum == corpus)
    assert(rows.forall(_.getAs[Long]("n_assigned") >= 1L))
  }

  test("domain kl: Gibbs bound holds, token accounting exact") {
    val rows = text.DomainKl.domainKl(spark, sf).collect()
    assert(rows.nonEmpty)
    // KL >= 0 up to the ScaledLn truncation (<= 2·ln(1+1/1024) nats)
    rows.foreach(r => assert(r.getAs[Double]("kl_nats") >= -0.002,
      s"${r.getAs[String]("source")} violates Gibbs: ${r.getAs[Double]("kl_nats")}"))
    assert(rows.exists(_.getAs[Double]("kl_nats") > 0.01),
      "fixture has no domain signal — audit vacuous")
    val total = Tables.documents(spark, sf)
      .select(explode(split(trim(lower($"text")), "\\s+"))).count()
    assert(rows.map(_.getAs[Long]("n_tokens")).sum == total)
  }

  test("training order: run accounting ties out, hash order interleaves") {
    val rows = text.TrainingOrder.trainingOrder(spark, sf).collect()
    val corpus = Tables.documents(spark, sf).count()
    assert(rows.map(_.getAs[Long]("n_docs")).sum == corpus)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_runs") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Long]("max_run") * r.getAs[Long]("n_runs")
        >= r.getAs[Long]("n_docs"), "max_run below the pigeonhole floor")
      // the md5 order must actually interleave: a source-length run means
      // the shuffle leaked a sort
      assert(r.getAs[Long]("max_run") < r.getAs[Long]("n_docs")
        || r.getAs[Long]("n_docs") == 1L)
    }
  }

  test("cms join size: estimate never undercounts the exact inner product") {
    val r = analytics.CmSketch.cmsJoinSize(spark, sf).collect()(0)
    val exact = r.getAs[Long]("exact_join_size")
    val est = r.getAs[Long]("cms_join_size")
    assert(exact > 0, "fixture join is empty — estimator untested")
    assert(est >= exact, s"CMS inner product undercounted: $est < $exact")
    assert(r.getAs[Long]("overcount") == est - exact)
  }

  test("boilerplate strip: row-conserving, rebuild preserves kept order") {
    val rows = text.BoilerplateStrip.boilerplateStrip(spark, sf).collect()
    val corpus = Tables.documents(spark, sf).count()
    assert(rows.length.toLong == corpus, "transform dropped document rows")
    rows.foreach { r =>
      assert(r.getAs[Long]("n_kept") <= r.getAs[Long]("n_segments"))
      val clean = r.getAs[String]("clean_text")
      assert((r.getAs[Long]("n_kept") == 0L) == clean.isEmpty)
    }
    // the fixture must exercise actual removal AND survival
    assert(rows.exists(_.getAs[Double]("pct_removed") > 0))
    assert(rows.exists(r => r.getAs[Long]("n_kept") == r.getAs[Long]("n_segments")))
    // kept segments appear in original order: clean_text must be a
    // subsequence of the normalized original, segment-wise
    val orig = Tables.documents(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getAs[String]("text").trim.toLowerCase).toMap
    rows.filter(_.getAs[Long]("n_kept") > 0).take(50).foreach { r =>
      val doc = orig(r.getAs[Long]("doc_id")).split("\\s+")
      val segs = doc.grouped(text.BoilerplateStrip.SegTokens)
        .map(_.mkString(" ")).toSeq
      val cleanSegs = segs.filter(s =>
        r.getAs[String]("clean_text").contains(s))
      assert(cleanSegs.mkString(" ").contains(r.getAs[String]("clean_text"))
        || segs.exists(_ == r.getAs[String]("clean_text")),
        s"rebuild lost segment order for doc ${r.getAs[Long]("doc_id")}")
    }
  }

  test("lm perplexity: cross-entropy bounded by smoothed-model extremes") {
    import graft.functions.ScaledLn
    val rows = text.LmPerplexity.lmPerplexity(spark, sf).collect()
    assert(rows.nonEmpty)
    val toks = Tables.documents(spark, sf)
      .select(explode(split(trim(lower($"text")), "\\s+")).as("w"))
    val vocab = toks.select($"w").distinct().count()
    val total = toks.count()
    // every -ln P term is positive (P < 1 since c2+1 < c1+V strictly
    // whenever V >= 2) and at most lnS(max_c1 + V) - ln(2)
    val hi = (ScaledLn.lnS(total + vocab) - ScaledLn.lnS(2L)).toDouble /
      ScaledLn.Scale
    rows.foreach { r =>
      val h = r.getAs[Double]("cross_entropy_nats")
      assert(h > 0, s"doc ${r.getAs[Long]("doc_id")}: H=$h not positive")
      assert(h <= hi, s"doc ${r.getAs[Long]("doc_id")}: H=$h above ceiling $hi")
    }
    // docs with >= 2 tokens all score; the corpus must spread (filter signal)
    val hs = rows.map(_.getAs[Double]("cross_entropy_nats"))
    assert(hs.max - hs.min > 0.1, "no perplexity spread — filter vacuous")
  }

  test("neyman: shares sum to one, allocation tracks n·s, not n alone") {
    val rows = sources.NeymanAllocation.neymanAllocation(spark, sf).collect()
    assert(rows.length >= 2)
    val shares = rows.map(_.getAs[Double]("alloc_share"))
    assert(math.abs(shares.sum - 1.0) < 1e-9, s"shares sum ${shares.sum}")
    rows.foreach { r =>
      assert(r.getAs[Double]("stddev") >= 0)
      assert(r.getAs[Double]("alloc_n") >= 0)
    }
    // Neyman must deviate from proportional whenever stddevs differ;
    // equality across the board would mean the fixture can't tell the
    // designs apart
    val nTot = rows.map(_.getAs[Long]("n_rows")).sum.toDouble
    val dev = rows.map(r => math.abs(r.getAs[Double]("alloc_share")
      - r.getAs[Long]("n_rows") / nTot)).max
    val sdSpread = rows.map(_.getAs[Double]("stddev"))
    if (sdSpread.max - sdSpread.min > 1e-6)
      assert(dev > 0, "allocation identical to proportional despite variance spread")
  }

  test("lf shapley: efficiency identity holds exactly per document") {
    // Σ_i φ_i(d) must equal sign(Σ votes) — the Shapley efficiency axiom
    // as an INTEGER identity (numerators over the common denominator 12)
    val voted = text.WeakLabels.voted(spark, sf).collect()
    def sign(x: Int) = if (x > 0) 1 else if (x < 0) -1 else 0
    val weights = text.LfShapley.WeightNum
    voted.take(200).foreach { r =>
      val v = Seq(r.getAs[Int]("v_length"), r.getAs[Int]("v_stopword"),
        r.getAs[Int]("v_digit"), r.getAs[Int]("v_lang_en"))
      val phiSum = v.indices.map { i =>
        val others = v.indices.filterNot(_ == i)
        others.toSet.subsets().map { s =>
          val base = s.toSeq.map(v).sum
          weights(s.size) * (sign(base + v(i)) - sign(base))
        }.sum
      }.sum
      assert(phiSum == text.LfShapley.WeightDenom * sign(v.sum),
        s"efficiency violated for doc ${r.getAs[Long]("doc_id")}")
    }
    // and the aggregated table's mean_abs dominates |mean|
    val rows = text.LfShapley.lfShapley(spark, sf).collect()
    assert(rows.length == 4)
    rows.foreach { r =>
      assert(math.abs(r.getAs[Double]("mean_shapley"))
        <= r.getAs[Double]("mean_abs_shapley") + 1e-12)
    }
  }

  test("q-digest: space bound, rank guarantee, universe covers domain") {
    import analytics.QDigest._
    val vals = Tables.orders(spark, sf)
      .select(floor($"o_totalprice").cast("long").as("v"))
    val maxCell = vals.agg(max(expr(s"v div $CellDollars"))).as[Long].head()
    assert(maxCell < (1L << Levels), "value domain exceeds the tree universe")
    val n = vals.count()
    val maxLeaf = vals.groupBy(expr(s"v div $CellDollars"))
      .count().agg(max($"count")).as[Long].head()
    val rows = qdigestQuantiles(spark, sf).collect()
    assert(rows.length == Quantiles.length)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_nodes") <= 3L * K, "digest exceeds 3k nodes")
      val target = r.getAs[Long]("target_rank")
      val rankAt = r.getAs[Long]("rank_at_est")
      assert(rankAt >= target, "estimate rank below target — not an upper bound")
      // q-digest rank slack: <= L·(n/k) absorbed mass, plus the terminal
      // cell's own population (cells are atomic at CellDollars resolution)
      assert(rankAt - target <= Levels * (n / K) + maxLeaf,
        s"rank error ${rankAt - target} above bound")
      assert(r.getAs[Long]("est_value") >= r.getAs[Long]("exact_value"))
    }
  }

  test("pca power: unit loadings track the same-round float reference") {
    val rows = similarity.PcaPower.pcaPower(spark, sf).collect()
      .sortBy(_.getAs[Int]("dim"))
    assert(rows.length == similarity.PcaPower.Dims)
    val loading = rows.map(_.getAs[Double]("loading"))
    assert(math.abs(loading.map(x => x * x).sum - 1.0) < 1e-9,
      "loadings not unit-norm")
    val share = rows.head.getAs[Double]("explained_share")
    assert(share > 0 && share <= 1.0 + 1e-12, s"share $share out of range")
    // reference: float covariance power iteration in Scala at the SAME
    // round count — pins the ALGORITHM (quantization noise only), since on
    // this deliberately near-isotropic synthetic corpus (λ2/λ1 ≈ 0.93) no
    // 4-round method converges to the true top eigenvector; on a real
    // anisotropic embedding corpus — the case the audit exists for — the
    // gap is large and the same 4 rounds lock in
    val data = Tables.embeddings(spark, sf).collect()
      .map(_.getAs[scala.collection.Seq[Float]]("embedding").toArray.map(_.toDouble))
    val n = data.length
    val d = data.head.length
    val mean = Array.tabulate(d)(j => data.map(_(j)).sum / n)
    val cen = data.map(v => Array.tabulate(d)(j => v(j) - mean(j)))
    def iterate(rounds: Int): Array[Double] = {
      var v = Array.fill(d)(1.0)
      for (_ <- 1 to rounds) {
        val s = Array.fill(d)(0.0)
        cen.foreach { x =>
          val dot = (0 until d).map(j => x(j) * v(j)).sum
          (0 until d).foreach(j => s(j) += dot * x(j))
        }
        val nrm = math.sqrt(s.map(x => x * x).sum)
        v = s.map(_ / nrm)
      }
      v
    }
    val ref = iterate(similarity.PcaPower.Rounds)
    val cos = math.abs((0 until d).map(j => loading(j) * ref(j)).sum)
    assert(cos > 0.999, s"quantized iterate off the float reference: |cos|=$cos")
    // and the iteration must actually IMPROVE on its start: Rayleigh
    // quotient of the result exceeds the all-ones seed's
    def rayleigh(v: Array[Double]): Double = {
      var num = 0.0
      cen.foreach { x =>
        val dot = (0 until d).map(j => x(j) * v(j)).sum
        num += dot * dot
      }
      num / v.map(x => x * x).sum
    }
    val seed = Array.fill(d)(1.0)
    assert(rayleigh(loading) > rayleigh(seed),
      "power iteration failed to improve the Rayleigh quotient")
  }

  test("modularity: Q in [-1/2, 1], accounting ties to the dense graph") {
    val rows = analytics.Modularity.modularity(spark, sf).collect()
    assert(rows.nonEmpty)
    val q = rows.map(_.getAs[Double]("contribution")).sum
    assert(q >= -0.5 && q <= 1.0, s"Q=$q outside Newman bounds")
    val twoW = analytics.LpaCommunities.denseEdges(spark, sf)
      .agg(sum($"w")).as[Long].head()
    // degree masses tile 2W exactly; intra weight never exceeds degree mass
    assert(rows.map(_.getAs[Long]("degree_mass")).sum == twoW)
    rows.foreach { r =>
      assert(r.getAs[Long]("intra_weight") <= r.getAs[Long]("degree_mass"))
    }
  }

  test("abtt: residual similarity bounded by the dimension effect") {
    val r = similarity.AbttResidual.abttResidual(spark, sf).collect()(0)
    val before = r.getAs[Double]("mean_abs_cos_before")
    val after = r.getAs[Double]("mean_abs_cos_after")
    assert(r.getAs[Long]("n_pairs") > 0)
    assert(before >= 0 && before <= 1 + 1e-12)
    assert(after >= 0 && after <= 1 + 1e-12)
    // On an ANISOTROPIC corpus ABTT deflates |cos| outright. This fixture
    // is deliberately near-isotropic with ≈0 mean, where the honest
    // expectation is the pure dimensionality effect: dropping one of d
    // directions scales E|cos| by ≈ sqrt(d/(d−1)) (E|cos| ~ sqrt(2/πd)).
    // Anything beyond that factor would mean the transform ADDED common
    // structure — the actual bug this spec guards against.
    val d = similarity.PcaPower.Dims
    val dimFactor = math.sqrt(d.toDouble / (d - 1))
    assert(after <= before * dimFactor * (1 + 1e-2),
      s"ABTT inflated mean |cos| beyond the dimension effect: $after vs $before")
    // and the share it reports is the model's own
    val share = similarity.PcaPower.pcaPower(spark, sf).collect()
      .head.getAs[Double]("explained_share")
    assert(r.getAs[Double]("explained_share") == share)
  }

  test("poisson bootstrap: weights concentrate, CI brackets the point") {
    import analytics.PoissonBootstrap._
    // interval table is a valid partition of [0, 2^32)
    val iv = WeightIntervals
    assert(iv.head._1 == 0L && iv.last._2 == 4294967295L)
    iv.sliding(2).foreach {
      case Seq(a, b) => assert(b._1 == a._2 + 1, "interval gap")
      case _ =>
    }
    // Poisson(1): P(0) mass ≈ 36.8% of 2^32
    assert(math.abs((iv.head._2 + 1) / 4294967296.0 - math.exp(-1)) < 1e-6)
    val rows = poissonBootstrap(spark, sf).collect()
    assert(rows.length == Replicates)
    val n = Tables.orders(spark, sf).count()
    rows.foreach { r =>
      // Poisson(1) total: n_eff within ±20% of n at these sizes
      val ne = r.getAs[Long]("n_eff")
      assert(math.abs(ne - n) * 5 <= n, s"replicate n_eff $ne far from $n")
      assert(r.getAs[Double]("ci_lo") <= r.getAs[Double]("boot_mean"))
      assert(r.getAs[Double]("boot_mean") <= r.getAs[Double]("ci_hi"))
    }
    val r0 = rows.head
    assert(r0.getAs[Double]("ci_lo") <= r0.getAs[Double]("point_mean") &&
      r0.getAs[Double]("point_mean") <= r0.getAs[Double]("ci_hi"),
      "percentile CI fails to bracket the point estimate")
  }

  test("key collisions: wider keys collide no more, birthday scale sane") {
    val rows = warehouse.KeyCollision.keyCollision(spark, sf).collect()
      .sortBy(_.getAs[Int]("key_bits"))
    assert(rows.length == 2)
    val Seq(r32, r62) = rows.toSeq
    assert(r62.getAs[Long]("collisions") <= r32.getAs[Long]("collisions"))
    assert(r62.getAs[Double]("expected_collisions") <
      r32.getAs[Double]("expected_collisions"))
    rows.foreach { r =>
      assert(r.getAs[Long]("collisions") >= 0)
      assert(r.getAs[Long]("n_distinct") <= r.getAs[Long]("n_keys"))
    }
    // observed 32-bit collisions within 10x of the birthday expectation
    // when the expectation is macroscopic (>= 1)
    val exp32 = r32.getAs[Double]("expected_collisions")
    if (exp32 >= 1.0)
      assert(r32.getAs[Long]("collisions") <= exp32 * 10 + 10,
        "collision count wildly off the birthday bound — hash broken?")
  }

  test("source ablation: closed form matches a brute-force re-dedup") {
    val rows = text.SourceAblation.sourceAblation(spark, sf).collect()
    assert(rows.nonEmpty)
    // brute force: for each source, apply the pairwise keep-lowest policy
    // to the corpus minus that source, in Scala
    val pairs = graft.dedup.Dedup.pairsForDir(spark, sf)
      .select($"doc_a", $"doc_b").collect()
      .map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")))
    val srcOf = Tables.documents(spark, sf).select($"doc_id", $"source")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[String]("source"))
      .toMap
    rows.foreach { r =>
      val s = r.getAs[String]("source")
      val expected = pairs.filter { case (a, b) =>
        srcOf(a) != s && srcOf(b) != s
      }.map(_._2).distinct.length.toLong
      assert(r.getAs[Long]("drops_without") == expected,
        s"ablation of $s: ${r.getAs[Long]("drops_without")} != $expected")
    }
    // dropping a source can only change the drop count downward vs full
    val fullDrops = pairs.map(_._2).distinct.length.toLong
    rows.foreach(r => assert(r.getAs[Long]("drops_without") <= fullDrops))
  }

  test("ks distance: equals a direct ECDF sup, flag matches threshold") {
    val r = analytics.KsDistance.ksDistance(spark, sf).collect()(0)
    val d = r.getAs[Double]("ks_distance")
    assert(d >= 0 && d <= 1)
    val vals = Tables.orders(spark, sf)
      .select(floor($"o_totalprice").cast("long").as("v"),
        dayofweek($"o_orderdate").isin(1, 7).cast("int").as("wk"))
      .collect().map(x => (x.getAs[Long]("v"), x.getAs[Int]("wk")))
    val a = vals.filter(_._2 == 1).map(_._1).sorted
    val b = vals.filter(_._2 == 0).map(_._1).sorted
    val sup = (a ++ b).distinct.map { x =>
      math.abs(a.count(_ <= x).toDouble / a.length
        - b.count(_ <= x).toDouble / b.length)
    }.max
    assert(math.abs(d - sup) < 1e-12, s"KS $d != direct sup $sup")
    assert((r.getAs[Int]("reject_05") == 1) ==
      (d > r.getAs[Double]("crit_05")))
  }

  test("mann-whitney: U matches a direct average-rank computation") {
    val r = analytics.MannWhitney.mannWhitney(spark, sf).collect()(0)
    val n1 = r.getAs[Long]("n1"); val n2 = r.getAs[Long]("n2")
    val u1 = r.getAs[Double]("u1")
    assert(u1 >= 0 && u1 <= n1.toDouble * n2, s"U=$u1 outside [0, n1·n2]")
    val vals = Tables.orders(spark, sf)
      .select(floor($"o_totalprice").cast("long").as("v"),
        dayofweek($"o_orderdate").isin(1, 7).cast("int").as("wk"))
      .collect().map(x => (x.getAs[Long]("v"), x.getAs[Int]("wk")))
    val sorted = vals.sortBy(_._1)
    // average ranks with ties, directly
    val ranks = scala.collection.mutable.Map.empty[Long, Double]
    var i = 0
    while (i < sorted.length) {
      var j = i
      while (j < sorted.length && sorted(j)._1 == sorted(i)._1) j += 1
      ranks(sorted(i)._1) = (i + 1 + j) / 2.0 // mean of ranks i+1..j
      i = j
    }
    val r1 = vals.filter(_._2 == 1).map(x => ranks(x._1)).sum
    val expectU = r1 - n1.toDouble * (n1 + 1) / 2
    assert(math.abs(u1 - expectU) < 1e-6, s"U=$u1 != direct $expectU")
    // effect size consistent with U
    assert(math.abs(r.getAs[Double]("rank_biserial")
      - (1 - 2 * u1 / (n1.toDouble * n2))) < 1e-12)
  }

  test("hier reconcile: bottom-up coheres by construction, gap is real") {
    val rows = analytics.HierReconcile.hierReconcile(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      // the emitted gap must be exactly direct − bottom_up
      assert(r.getAs[Long]("coherence_gap") ==
        r.getAs[Long]("direct_fc") - r.getAs[Long]("bottom_up_fc"))
      assert(r.getAs[Long]("n_months") >= 1)
      assert(r.getAs[Long]("mae_num_direct") >= 0)
    }
    // the floor nonlinearity (and nation-months missing history) must
    // produce at least one incoherent region or the fixture can't tell
    // reconciliation strategies apart
    assert(rows.exists(_.getAs[Long]("coherence_gap") != 0L),
      "all regions coherent — base forecaster degenerate for this test")
  }

  test("fd discovery: key FDs hold, attribute FDs fail, accounting ties") {
    val rows = warehouse.FdDiscovery.fdDiscovery(spark, sf).collect()
      .map(r => (r.getAs[String]("lhs"), r.getAs[String]("rhs")) -> r).toMap
    assert(rows.size == warehouse.FdDiscovery.Candidates.size)
    // primary-key determinations must hold
    assert(rows(("o_orderkey", "o_custkey")).getAs[Int]("holds") == 1)
    assert(rows(("o_orderkey", "o_orderstatus")).getAs[Int]("holds") == 1)
    assert(rows(("c_custkey", "c_mktsegment")).getAs[Int]("holds") == 1)
    // attribute→attribute with high-cardinality groups must fail
    assert(rows(("o_orderstatus", "o_orderpriority")).getAs[Int]("holds") == 0)
    assert(rows(("c_nationkey", "c_mktsegment")).getAs[Int]("holds") == 0)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("violating_groups") <= r.getAs[Long]("n_groups"))
      assert((r.getAs[Int]("holds") == 1) ==
        (r.getAs[Long]("violating_groups") == 0L))
      assert(r.getAs[Long]("violating_rows") >= r.getAs[Long]("violating_groups") * 2
        || r.getAs[Long]("violating_groups") == 0L,
        "a violating group needs at least two rows")
    }
  }

  test("ind discovery: reference chains hold, cross-key candidates fail") {
    val rows = warehouse.IndDiscovery.indDiscovery(spark, sf).collect()
      .map(r => r.getAs[String]("lhs") -> r).toMap
    assert(rows.size == warehouse.IndDiscovery.Candidates.size)
    // the declared TPC-H FK chains must hold
    for (k <- Seq("lineitem.l_orderkey", "customer.c_nationkey",
        "nation.n_regionkey"))
      assert(rows(k).getAs[Int]("holds") == 1, s"$k should hold")
    // order keys are not customer keys
    assert(rows("orders.o_orderkey").getAs[Int]("holds") == 0)
    rows.values.foreach { r =>
      assert(r.getAs[Long]("orphan_values") <= r.getAs[Long]("n_distinct"))
      assert(r.getAs[Long]("orphan_rows") >= r.getAs[Long]("orphan_values")
        || r.getAs[Long]("orphan_values") == 0L)
      assert((r.getAs[Int]("holds") == 1) ==
        (r.getAs[Long]("orphan_values") == 0L))
    }
  }

  test("chi2: matches a direct contingency computation") {
    val r = analytics.ChiSquare.chiSquare(spark, sf).collect()(0)
    val chi2 = r.getAs[Double]("chi2")
    assert(chi2 >= 0)
    assert(r.getAs[Long]("dof") ==
      (r.getAs[Long]("n_statuses") - 1) * (r.getAs[Long]("n_priorities") - 1))
    val cells = Tables.orders(spark, sf)
      .groupBy($"o_orderstatus", $"o_orderpriority").count().collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getAs[Long]("count")).toMap
    val n = cells.values.sum.toDouble
    val rs = cells.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cs = cells.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val direct = cells.map { case ((s, p), o) =>
      val e = rs(s) * cs(p) / n
      (o - e) * (o - e) / e
    }.sum
    assert(math.abs(chi2 - direct) < 1e-8 * (1 + direct),
      s"chi2 $chi2 != direct $direct")
    val v = r.getAs[Double]("cramers_v")
    assert(v >= 0 && v <= 1 + 1e-12)
  }

  test("stream asof enrich: both dim versions hit, split at the cutover") {
    import streaming.IncrementalIngest._
    val rows = asofEnrichEntry(spark, sf).collect()
    val byType = rows.groupBy(_.getAs[String]("event_type"))
    val events = Tables.events(spark, sf)
      .filter($"event_type".isNotNull)
    for ((t, w) <- EnrichWeights) {
      val versions = byType.getOrElse(t, Array.empty)
        .map(r => r.getAs[Int]("weight") -> r.getAs[Long]("n_events")).toMap
      assert(versions.keySet == Set(w, w + 10),
        s"$t must carry exactly its two SCD2 versions, got ${versions.keySet}")
      // the version split must equal the batch count on each side of the
      // cutover — the exact thing a current-version join would get wrong
      val pre = events.filter($"event_type" === t &&
        expr(s"unix_millis(ts) < ${Scd2CutoverMs}L")).count()
      assert(versions(w) == pre, s"$t v1 count ${versions(w)} != batch $pre")
    }
  }

  test("spearman: matches a direct tie-averaged rank correlation") {
    val r = analytics.SpearmanCorr.spearmanCorr(spark, sf).collect()(0)
    val rho = r.getAs[Double]("spearman_rho")
    assert(rho >= -1 - 1e-12 && rho <= 1 + 1e-12)
    val vals = Tables.orders(spark, sf)
      .select(floor($"o_totalprice").cast("long").as("x"),
        datediff($"o_orderdate", lit("1970-01-01")).cast("long").as("y"))
      .collect().map(x => (x.getAs[Long]("x"), x.getAs[Long]("y")))
    def ranks(xs: Seq[Long]): Map[Long, Double] = {
      val sorted = xs.sorted
      sorted.distinct.map { v =>
        val lo = sorted.indexWhere(_ == v) + 1
        val hi = sorted.lastIndexWhere(_ == v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    val rx = ranks(vals.map(_._1).toSeq); val ry = ranks(vals.map(_._2).toSeq)
    val xs = vals.map(v => rx(v._1)); val ys = vals.map(v => ry(v._2))
    val n = vals.length
    val mx = xs.sum / n; val my = ys.sum / n
    val direct = xs.zip(ys).map { case (a, b) => (a - mx) * (b - my) }.sum /
      math.sqrt(xs.map(a => (a - mx) * (a - mx)).sum *
        ys.map(b => (b - my) * (b - my)).sum)
    assert(math.abs(rho - direct) < 1e-9, s"rho $rho != direct $direct")
  }

  test("conformal: qhat is the exact order statistic, coverage near target") {
    val r = analytics.ConformalInterval.conformalInterval(spark, sf).collect()(0)
    val nC = r.getAs[Long]("n_calib")
    assert(nC > 0 && r.getAs[Long]("n_test") > 0)
    // recompute q̂ directly: k-th smallest calibration residual
    import graft.functions.Md5Hash
    val rows = Tables.orders(spark, sf)
      .select($"o_orderpriority".as("g"),
        floor($"o_totalprice").cast("long").as("x"),
        (Md5Hash.h32(concat(lit("cp:"), $"o_orderkey".cast("string"))) % 4)
          .as("fold")).collect()
      .map(x => (x.getAs[String]("g"), x.getAs[Long]("x"), x.getAs[Long]("fold")))
    val pred = rows.filter(_._3 <= 1).groupBy(_._1).view
      .mapValues(v => v.map(_._2).sum / v.length).toMap
    val resid = rows.filter(_._3 == 2).map(v => math.abs(v._2 - pred(v._1))).sorted
    val k = math.ceil((resid.length + 1) * 0.9).toInt
    assert(r.getAs[Long]("qhat") == resid(k - 1),
      s"qhat ${r.getAs[Long]("qhat")} != direct ${resid(k - 1)}")
    // finite-sample guarantee holds in expectation; allow sampling noise
    // around the target on the finite test fold
    val cov = r.getAs[Double]("coverage")
    val slack = 3 * math.sqrt(0.9 * 0.1 / r.getAs[Long]("n_test"))
    assert(cov >= 0.9 - slack, s"coverage $cov below target minus noise band")
  }

  test("q-digest merge: union + recompress keeps the rank guarantee") {
    import analytics.QDigest._
    // two digests from DISJOINT halves, merged the way a two-executor
    // rollup would: node-count union, recompress under the combined n
    val halves = Tables.orders(spark, sf)
      .select(expr(s"floor(o_totalprice) div $CellDollars").as("id"),
        (dayofweek($"o_orderdate").isin(1, 7)).cast("int").as("wk"))
      .groupBy($"id").agg(
        sum($"wk".cast("long")).as("a"), sum(lit(1L) - $"wk").as("b"))
      .collect().map(r => (r.getAs[Long]("id"),
        r.getAs[Long]("a"), r.getAs[Long]("b")))
    val la = halves.filter(_._2 > 0).map(h => (Levels, h._1) -> h._2).toMap
    val lb = halves.filter(_._3 > 0).map(h => (Levels, h._1) -> h._3).toMap
    val d1 = compress(la, la.values.sum)
    val d2 = compress(lb, lb.values.sum)
    val union = (d1 ++ d2).groupBy(t => (t._1, t._2)).view
      .mapValues(_.map(_._3).sum).toMap
    val n = la.values.sum + lb.values.sum
    val merged = compress(union, n)
    assert(merged.map(_._3).sum == n, "merge lost mass")
    assert(merged.size <= 3 * K, "merged digest exceeds 3k nodes")
    // rank guarantee after ONE merge: error <= 2·L·n/k (each input digest
    // contributes up to L·n_i/k absorbed mass), plus the terminal cell
    val leafTotals = halves.map(h => h._1 -> (h._2 + h._3)).toMap
    val maxLeaf = leafTotals.values.max
    val ordered = merged.sortBy(t => (t._4, -t._1))
    val cums = ordered.scanLeft(0L)(_ + _._3).tail
    for ((qn, qd) <- Quantiles) {
      val target = (n * qn + qd - 1) / qd
      val rt = ordered(cums.indexWhere(_ >= target))._4
      val rankAt = leafTotals.filter(_._1 <= rt).values.sum
      assert(rankAt >= target)
      assert(rankAt - target <= 2 * Levels * (n / K) + maxLeaf,
        s"merged digest rank error ${rankAt - target} above the merge bound")
    }
  }
}
