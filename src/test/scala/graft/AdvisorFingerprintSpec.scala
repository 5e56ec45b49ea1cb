package graft

import graft.observability.PlanFingerprint
import graft.warehouse.JoinAdvisor
import org.apache.spark.sql.functions._

/** The two plan-governance additions: the join-strategy advisor's advice
  * must agree with what the engine actually plans where their thresholds
  * overlap, and the plan fingerprint must detect shape drift.
  */
class AdvisorFingerprintSpec extends SparkSpec {
  import spark.implicits._

  test("advisor exercises every strategy branch and orders by measured rows") {
    // sf0.01 — the correctness SF, where the row thresholds split the
    // audited joins across all three strategies (sf0.001 is too small to
    // put any right side between the broadcast limit and the hash ratio)
    val rows = JoinAdvisor.joinAdvisor(spark, "/root/testdata/sf0.01")
      .as[(String, String, String, Long, Long, String)].collect()
    assert(rows.length == JoinAdvisor.AuditedJoins.length)
    val strategies = rows.map(_._6).toSet
    assert(strategies == Set("broadcast", "shuffle_hash", "sort_merge"),
      s"decision rule must hit all branches at test SF, got $strategies")
    rows.foreach { case (_, _, _, l, r, s) =>
      val expected =
        if (r <= JoinAdvisor.BroadcastRowLimit) "broadcast"
        else if (l >= JoinAdvisor.HashRatio * r) "shuffle_hash"
        else "sort_merge"
      assert(s == expected)
    }
  }

  test("where advisor says broadcast, the engine's own plan broadcasts too") {
    // nation ⋈ region (advisor: broadcast — region is 5 rows): the planned
    // join must be a BroadcastHashJoin, i.e. the measured-stats advice and
    // the engine's estimate-based choice coincide well inside the threshold
    val q = Tables.nation(spark, sf)
      .join(Tables.region(spark, sf), $"n_regionkey" === $"r_regionkey")
      .groupBy($"r_name").agg(count(lit(1)).as("n"))
    assert(PlanFingerprint.fingerprint(q)("bhj") >= 1,
      "engine should broadcast a 5-row dim")
  }

  test("fingerprint detects plan drift (extra shuffle changes the counts)") {
    val base = Tables.orders(spark, sf)
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    val drifted = Tables.orders(spark, sf)
      .repartition(7, $"o_orderkey") // the accidental extra exchange
      .groupBy($"o_orderstatus").agg(count(lit(1)).as("n"))
    val (fBase, fDrift) =
      (PlanFingerprint.fingerprint(base), PlanFingerprint.fingerprint(drifted))
    assert(fDrift("exchange") > fBase("exchange"),
      "an injected repartition must surface as a fingerprint diff")
  }
}
