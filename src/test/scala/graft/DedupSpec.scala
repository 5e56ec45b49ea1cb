package graft

import graft.dedup.{Dedup, MinHashLsh, SimHash}
import org.apache.spark.sql.functions._

/** Dedup-family semantics: the exact path is oracle-checked by the driver;
  * these specs pin the relationships BETWEEN the families (LSH recall vs the
  * exact Jaccard join, SimHash finding the planted near-dups) that no SQL
  * oracle can express.
  */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  test("cdc chunking is shift-resistant where fixed-width segmentation is not") {
    // 200 tokens of md5-derived "content", duplicated with ONE token
    // prepended — the edit that breaks every fixed-width segment boundary
    val words = (0 until 200).map(i =>
      graft.functions.Md5Hash.md5Int(s"w$i").toString).mkString(" ")
    val feed = Seq((1L, words), (2L, "zzz " + words)).toDF("doc_id", "text")
    val led = dedup.CdcChunks.cdcLedgerDf(feed).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    val (n1, k1, d1) = led(1L)
    val (n2, k2, d2) = led(2L)
    // doc 1 is first: keeps everything
    assert(k1 == n1 && d1 == 0, s"original must keep all chunks: $led")
    // the shifted copy re-aligns after the perturbed prefix: MOST of its
    // chunks match doc 1's and are dropped (fixed-width segments would
    // match none — SegmentDedup on the same feed drops ~0)
    assert(d2 * 2 > n2, s"shifted copy should drop most chunks, got $led")
    // (the fixed-width contrast is structural: a 1-token shift changes every
    // SegTokens-aligned window, so no cross-doc segment fingerprint can
    // match; the cdc ledger alone carries the assertion to keep the fixture
    // one pipeline)
    assert(n2 >= n1 - 2 && n2 <= n1 + 2,
      "chunk counts should be within the one perturbed region")
  }

  test("cdc kernel corners: empty, whitespace-only, and null docs behave " +
      "like the declarative explode pipeline they replaced") {
    val feed = Seq(
      (1L, Some("")),            // tokenizes to [""] → one chunk, kept
      (2L, Some("   ")),         // trims to "" → same single chunk → dropped
      (3L, None)                 // null text drops entirely
    ).toDF("doc_id", "text")
    val led = dedup.CdcChunks.cdcLedgerDf(feed).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(led.keySet == Set(1L, 2L), "null doc must be absent")
    assert(led(1L) == ((1L, 1L)), "empty doc: one chunk, first occurrence kept")
    assert(led(2L) == ((1L, 0L)), "whitespace doc: same fingerprint, dropped")
  }

  test("exact dedup finds exactly the planted duplicate groups") {
    val groups = Dedup.exact(spark, sf).collect()
    val planted = Tables.documents(spark, sf)
      .filter(pmod($"doc_id", lit(10)) === 0).count()
    // every 10th doc was replayed once → that many groups of exactly 2,
    // unless distinct docs share identical text (none in this corpus)
    assert(groups.length == planted)
    assert(groups.forall(_.getLong(2) == 2))
  }

  test("ngram Jaccard finds the planted near-duplicates with jaccard in (0,1]") {
    val pairs = Dedup.ngramJaccard(spark, sf).collect()
    assert(pairs.nonEmpty, "testdata contains planted near-dup documents")
    pairs.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      val j = r.getDouble(2)
      assert(j >= 0.2 && j <= 1.0)
    }
  }

  test("MinHash-LSH recovers the exact-Jaccard pairs (recall at tau=0.2)") {
    val exact = Dedup.ngramJaccard(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val lsh = MinHashLsh.nearDuplicates(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    // LSH verifies with exact Jaccard, so it can only miss (never invent):
    assert(lsh.keySet.subsetOf(exact.keySet))
    lsh.foreach { case (k, j) => assert(math.abs(j - exact(k)) < 1e-12) }
    // banding (8 bands × 4 rows) catches j ≥ 0.5 pairs essentially always —
    // those are the pairs a dedup pass must not miss
    val strong = exact.filter(_._2 >= 0.5).keySet
    assert(strong.subsetOf(lsh.keySet),
      s"missed strong pairs: ${strong -- lsh.keySet}")
  }

  test("incremental near-dup equals the full LSH pair set restricted to the batch") {
    def isNew(id: Long): Boolean = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s"batch:$id".getBytes("UTF-8"))
      "%02x".format(d(0)).charAt(0) == 'f'
    }
    val full = MinHashLsh.nearDuplicates(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val inc = MinHashLsh.incrementalNearDuplicates(spark, sf).collect()
      .map(r => ((r.getLong(0), r.getLong(1)), r.getDouble(2), r.getString(3)))
    assert(inc.nonEmpty, "the 1/16 batch should collide with something")
    // same banding, same verify: the incremental set IS the full τ-pair set
    // filtered to pairs touching the batch — no more, no less
    val expected = full.keySet.filter { case (a, b) => isNew(a) || isNew(b) }
    assert(inc.map(_._1).toSet == expected)
    inc.foreach { case (k, j, tag) =>
      assert(math.abs(j - full(k)) < 1e-12)
      val want = if (isNew(k._1) && isNew(k._2)) "batch_internal" else "vs_corpus"
      assert(tag == want, s"pair $k mis-tagged $tag")
    }
  }

  test("SimHash flags near-identical pairs (j >= 0.95) within its Hamming radius") {
    val sim = SimHash.nearDuplicates(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val strong = Dedup.ngramJaccard(spark, sf, threshold = 0.95).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(strong.nonEmpty, "corpus plants near-identical pairs")
    assert(strong.subsetOf(sim),
      s"simhash missed near-identical pairs: ${strong -- sim}")
    sim.foreach { case (a, b) => assert(a < b) }
  }

  test("keep-best survivor is the longest member of its own cluster") {
    import graft.dedup.DupClusters
    val best = DupClusters.keepBest(spark, sf)
    val labeled = DupClusters.clusters(spark, sf)
      .join(graft.Tables.documents(spark, sf).select($"doc_id", $"n_chars"), "doc_id")
    val check = best.as("b").join(labeled.as("l"),
      $"b.kept_doc" === $"l.doc_id" && $"b.cluster_id" === $"l.cluster_id")
    // every survivor is a member of its cluster…
    assert(check.count() == best.count())
    // …and carries that cluster's maximum length
    val maxes = labeled.groupBy($"cluster_id").agg(max($"n_chars").as("mx"))
    assert(best.join(maxes, "cluster_id")
      .filter($"kept_chars" =!= $"mx").count() == 0)
    // clusters only contain documents with at least one near-dup partner
    assert(best.filter($"n_members" < 2).count() == 0)
  }

  test("simhash fingerprints are deterministic across runs") {
    val idx = graft.dedup.DocIndex.forDir(spark, sf)
    val f1 = SimHash.fingerprints(idx)
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val f2 = SimHash.fingerprints(idx)
      .orderBy($"doc_id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(f1.sameElements(f2))
  }

  test("LSH S-curve is a proper monotone probability curve") {
    val rows = graft.dedup.MinHashLsh.sCurve(spark, sf)
      .orderBy($"pct").collect()
    assert(rows.length == 19)
    val ps = rows.map(_.getAs[Double]("p_candidate"))
    ps.foreach(pc => assert(pc >= 0.0 && pc <= 1.0))
    // candidate probability is strictly increasing in similarity
    ps.sliding(2).foreach { case Array(a, b) => assert(b > a) }
    // band-match probability is s^RowsPerBand exactly at the grid points
    rows.foreach { r =>
      val sVal = r.getAs[Double]("s")
      val expected = sVal * sVal * (sVal * sVal)
      assert(r.getAs[Double]("p_band_match") == expected)
    }
  }
}
