package graft

import graft.analytics.EventSeq
import graft.similarity.Standardize
import graft.text.TfIdf

/** Semantic invariants of the sequence/sketch/scaling batch — the properties
  * the row-hash oracle can't express: probability closure, sketch error
  * bounds, and the moment identities of standardization.
  */
class EventSeqSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("transition probabilities close to 1 per from-state") {
    val rows = EventSeq.transitions(spark, sf)
      .groupBy($"from_type").agg(sum($"p").as("total_p")).collect()
    assert(rows.nonEmpty)
    rows.foreach(r => assert(math.abs(r.getDouble(1) - 1.0) < 1e-9,
      s"${r.getString(0)} row sums to ${r.getDouble(1)}"))
  }

  test("transition counts conserve the sequence length") {
    val e = Tables.events(spark, sf)
      .filter($"user_id".isNotNull && $"user_id" > 0 &&
        $"ts".isNotNull && $"event_id".isNotNull && $"event_type".isNotNull)
    val nEvents = e.count()
    val nUsers = e.select($"user_id").distinct().count()
    val nTransitions = EventSeq.transitions(spark, sf)
      .agg(sum($"n")).collect()(0).getLong(0)
    // each user's k events yield k-1 transitions
    assert(nTransitions == nEvents - nUsers)
  }

  test("HLL estimate lands within the m=64 error envelope") {
    val m = EventSeq.HllRegisters.toDouble
    val rows = EventSeq.hllDistinct(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (exact, nRegs, raw) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(nRegs <= EventSeq.HllRegisters)
      // the query emits the raw alpha*m^2/Z estimate (log-free, so it can be
      // hash-compared cross-engine); at sf0.001 cardinalities sit in the
      // small-range regime, where the standard correction is linear counting
      // over the V empty registers — apply it here, JVM-side
      val v = EventSeq.HllRegisters - nRegs
      val corrected = if (raw < 2.5 * m && v > 0) m * math.log(m / v) else raw
      // 1.04/sqrt(64) = 13% standard error; allow ~3 sigma
      assert(math.abs(corrected - exact) / exact < 0.4,
        s"${r.getString(0)}: exact $exact corrected $corrected raw $raw")
    }
  }

  test("dimension stats are coherent moments") {
    val rows = Standardize.dimStats(spark, sf).collect()
    assert(rows.length == 64)
    rows.foreach { r =>
      val (mean, std, mn, mx) =
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(std > 0)
      assert(mean >= mn && mean <= mx)
      assert(std <= (mx - mn)) // popstd is bounded by half the range
    }
  }

  test("standardized probe components are unit-scale z-scores") {
    val z = Standardize.standardize(spark, sf)
    assert(z.count() == Standardize.ProbeVecs * 64L)
    // z = (v - mean)/std with corpus moments: probe z-scores stay in a
    // plausible envelope (|z| < 6) and are not degenerate
    val stats = z.agg(min($"z"), max($"z")).collect()(0)
    assert(stats.getDouble(0) < 0 && stats.getDouble(1) > 0)
    assert(math.abs(stats.getDouble(0)) < 6 && stats.getDouble(1) < 6)
  }

  test("tf-idf keeps at most TopK terms per doc, scores descending") {
    val rows = TfIdf.tfidfTopK(spark, sf).collect()
    val byDoc = rows.groupBy(_.getLong(0))
    assert(byDoc.nonEmpty)
    byDoc.foreach { case (_, rs) =>
      assert(rs.length <= TfIdf.TopK)
      val scores = rs.sortBy(_.getInt(5)).map(_.getDouble(4))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b })
    }
  }

  test("boilerplate coverage is a valid ratio and finds planted dups") {
    val rows = TfIdf.boilerplate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(2) <= r.getLong(1))
      val ratio = r.getDouble(3)
      assert(ratio >= 0.0 && ratio <= 1.0)
    }
    // replayed duplicate docs share every shingle -> some docs are flagged
    assert(rows.exists(_.getDouble(3) > 0.0))
  }
}
