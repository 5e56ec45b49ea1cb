package graft

import graft.analytics.CmSketch

class CmSketchSpec extends SparkSpec {

  test("deterministic CMS never under-counts and over-counts are collisions") {
    val rows = CmSketch.cmsEstimates(spark, sf).collect()
    assert(rows.length == CmSketch.TopK)
    rows.foreach { r =>
      val exact = r.getAs[Long]("n_exact")
      val est   = r.getAs[Long]("cms_est")
      assert(est >= exact, s"CMS under-counted: $r")
      assert(r.getAs[Long]("overcount") == est - exact)
    }
    // top-k is ordered by exact count descending
    val exacts = rows.map(_.getAs[Long]("n_exact")).toSeq
    assert(exacts == exacts.sorted.reverse)
  }
}
