package graft

import graft.analytics.BloomSketch

class BloomSketchSpec extends SparkSpec {

  test("bloom filter: no false negatives by construction, bounded FP rate") {
    val r = BloomSketch.bloomFpReport(spark, sf).collect().head
    val bitsSet = r.getAs[Long]("n_bits_set")
    val m = BloomSketch.BloomWords * BloomSketch.WordBits
    assert(bitsSet > 0 && bitsSet <= m)
    // fill cannot exceed insertions
    assert(bitsSet <= r.getAs[Long]("n_members") * BloomSketch.BloomK)
    // every probe key is a non-member, so hits are exactly the FPs; the
    // empirical rate must stay within a loose multiple of the fill^k bound
    val fill = bitsSet.toDouble / m
    val fpBound = math.pow(fill, BloomSketch.BloomK)
    val fp = r.getAs[Long]("n_false_pos").toDouble / r.getAs[Long]("n_probes")
    assert(fp <= fpBound * 3 + 0.02,
      s"fp=$fp beyond bound ~$fpBound (fill=$fill)")
  }
}
