package graft

import graft.privacy.Privacy

/** Privacy audits: k-anonymity class accounting, l-diversity over the
  * diagnosis pipeline, and monotonicity of the generalization ladder.
  */
class PrivacySpec extends SparkSpec {

  test("k-anonymity: risky rows/classes are consistent and bounded") {
    val rows = Privacy.kAnonymity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val nClasses = r.getAs[Long]("n_classes")
      val nRisky   = r.getAs[Long]("n_risky_classes")
      val nRows    = r.getAs[Long]("n_rows")
      val nRiskyRw = r.getAs[Long]("n_risky_rows")
      val k        = r.getAs[Long]("k_achieved")
      assert(nRisky <= nClasses)
      assert(nRiskyRw <= nRows)
      assert(k >= 1)
      // a risky class exists iff the achieved k is below the threshold
      assert((nRisky > 0) == (k < Privacy.K))
      // every risky class has < K rows
      assert(nRiskyRw < nRisky * Privacy.K + 1)
    }
  }

  test("l-diversity: min_l bounds and risk accounting") {
    val rows = Privacy.lDiversity(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("min_l") >= 1)
      assert(r.getAs[Long]("n_low_diversity_classes") <=
        r.getAs[Long]("n_classes"))
    }
  }

  test("generalization ladder: coarser levels are monotonically safer") {
    val rows = Privacy.generalizationLadder(spark, sf).collect()
      .sortBy(_.getAs[Int]("level"))
    assert(rows.map(_.getAs[Int]("level")).toSeq == Seq(0, 1, 2, 3))
    // generalizing can only merge classes: fewer classes, larger minimum,
    // higher anonymous share
    rows.sliding(2).foreach { case Array(fine, coarse) =>
      assert(coarse.getAs[Long]("n_classes") <= fine.getAs[Long]("n_classes"))
      assert(coarse.getAs[Long]("k_achieved") >= fine.getAs[Long]("k_achieved"))
      assert(coarse.getAs[Double]("pct_k_anonymous") + 1e-9 >=
        fine.getAs[Double]("pct_k_anonymous"))
    }
    // the fully-generalized level is one class holding every row
    assert(rows.last.getAs[Long]("n_classes") == 1L)
    assert(rows.last.getAs[Double]("pct_k_anonymous") == 100.0)
  }
}
