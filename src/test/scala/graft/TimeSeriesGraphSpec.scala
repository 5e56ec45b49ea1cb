package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Invariants for the round-4 window/graph additions: the RANGE-frame
  * trailing window (independently recomputed via an interval self-join),
  * the truncated EWMA (weighted-mean bounds + head identity), and BFS hop
  * distances (frontier soundness).
  */
class TimeSeriesGraphSpec extends SparkSpec {
  import spark.implicits._

  private def cleanEvents = Tables.events(spark, sf)
    .filter($"ts".isNotNull && $"user_id".isNotNull && $"value".isNotNull)

  test("trailing RANGE frame matches an interval self-join recomputation") {
    val got = analytics.TimeSeries.trailingRange(spark, sf)
      .select($"event_id", $"n_1h").as[(Long, Long)].collect().toMap
    val ev = cleanEvents
      .select($"user_id", $"event_id", unix_timestamp($"ts").as("sec"))
    val want = ev.as("a")
      .join(ev.as("b"), $"a.user_id" === $"b.user_id"
        && $"b.sec" >= $"a.sec" - analytics.TimeSeries.RangeSecs
        && $"b.sec" <= $"a.sec")
      .groupBy($"a.event_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got.nonEmpty && got == want,
      "RANGE-frame counts disagree with the interval self-join")
  }

  test("ewma is a weighted mean: bounded by the user's trailing extremes, head = value") {
    val out = analytics.TimeSeries.ewma(spark, sf)
    val bounds = cleanEvents.groupBy($"user_id")
      .agg(min($"value").as("lo"), max($"value").as("hi"))
    val off = out.join(bounds, "user_id")
      // decimal(12,2) quantization of v can sit half a cent outside the
      // raw double min/max
      .filter($"ewma" < $"lo" - 0.005 || $"ewma" > $"hi" + 0.005)
      .count()
    assert(off === 0, "ewma escaped the [min,max] envelope of its inputs")
    val firsts = cleanEvents
      .withColumn("rn", row_number().over(
        Window.partitionBy($"user_id").orderBy($"ts", $"event_id")))
      .filter($"rn" === 1).select($"event_id")
    val headMismatch = out.join(firsts, "event_id")
      .filter($"ewma" =!= $"value").count()
    assert(headMismatch === 0,
      "series head must equal its own value (single-tap weighted mean)")
  }

  test("bfs hops: seed at zero, frontier sound, horizon respected") {
    val hops = analytics.GraphOps.bfsHops(spark, sf)
      .collect().map(r => (r.getString(0), r.getInt(1)))
    assert(hops.nonEmpty)
    val byName = hops.toMap
    assert(byName(s"NATION_${analytics.GraphOps.BfsSeed}") === 0)
    assert(hops.forall { case (_, h) =>
      h >= 0 && h <= analytics.GraphOps.BfsRounds })
    // every hop-h (h>0) node has an in-edge from a hop-(h−1) node
    val nation = Tables.nation(spark, sf)
      .select($"n_nationkey".as("v"), $"n_name")
    val dist = nation.as("n")
      .join(analytics.GraphOps.bfsHops(spark, sf).as("h"),
        $"n.n_name" === $"h.n_name")
      .select($"v", $"hops")
    val edges = analytics.GraphOps.tradeEdges(spark, sf)
      .select($"src", $"dst").distinct()
    val unsupported = dist.filter($"hops" > 0).as("d")
      .join(edges, $"d.v" === $"dst")
      .join(dist.select($"v".as("sv"), $"hops".as("sh")), $"src" === $"sv")
      .groupBy($"d.v", $"d.hops".as("h")).agg(min($"sh").as("best_in"))
      .filter($"best_in" =!= $"h" - 1)
      .count()
    assert(unsupported === 0,
      "a reached node's best in-neighbor must sit exactly one hop closer")
  }

  test("k-core: fixed unrolling reaches the fixpoint; core degrees >= k") {
    val atRounds = analytics.GraphOps.kcore(spark, sf)
      .collect().map(_.toString).sorted.toSeq
    // one extra peel changes nothing → the fixed unrolling IS the k-core
    val onePast = analytics.GraphOps
      .kcore(spark, sf, rounds = analytics.GraphOps.KcoreRounds + 1)
      .collect().map(_.toString).sorted.toSeq
    assert(atRounds == onePast,
      s"peeling had not converged after ${analytics.GraphOps.KcoreRounds} rounds")
    // defining property: every surviving node keeps >= k in-core neighbors
    val below = analytics.GraphOps.kcore(spark, sf)
      .filter(col("core_degree") < analytics.GraphOps.KcoreK).count()
    assert(below === 0, "k-core member with fewer than k in-core neighbors")
  }
}
