package graft

import org.apache.spark.sql.functions._

/** Pins the two arrival-time operators the oracle can only check on the
  * in-order synthetic feed: the sharded running-max lateness profile
  * (constructed disorder, including a straggler that crosses a shard
  * boundary — the merge step the single-window form never exercises) and
  * the OHLC candle identities.
  */
class LatenessOhlcSpec extends SparkSpec {
  import spark.implicits._

  test("lateness: constructed disorder lands in the right bands across shards") {
    val S = ingest.LatenessProfile.ShardSize
    // arrival 0..9 in shard 0 with one 90-second straggler at arrival 3;
    // arrival S..S+2 in shard 1, where S is 2 days older than the max of
    // shard 0 — its lateness must be measured against shard 0's max,
    // which only the cross-shard prefix merge can see.
    val base = 1_700_000_000_000L
    val rows = (0L to 9L).map { i =>
      val t = if (i == 3) base + 2 * 60000 - 90000 else base + i * 60000
      (i, t)
    } ++ Seq(
      (S, base + 9 * 60000 - 2 * 86400000L), // over 1 day late, shard 1
      (S + 1, base + 9 * 60000 + 60000),      // new max, on time
      (S + 2, base + 9 * 60000 + 60000 - 30000)) // 30 s late
    val df = rows.toDF("arrival_id", "tms")
    val lagged = ingest.LatenessProfile.withLateness(df)
      .select($"arrival_id", $"late_ms").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(lagged(3L) == 90000L, "in-shard straggler lateness")
    assert(lagged(0L) == 0L && lagged(9L) == 0L)
    assert(lagged(S) == 2 * 86400000L,
      "cross-shard straggler must lag shard 0's max, not its own shard's")
    assert(lagged(S + 1) == 0L)
    assert(lagged(S + 2) == 30000L)

    val bands = ingest.LatenessProfile.bandProfile(
      ingest.LatenessProfile.withLateness(df))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bands("0_on_time") == 10L)
    assert(bands("1_under_1m") == 1L)
    assert(bands("2_under_1h") == 1L)
    assert(bands("4_over_1d") == 1L)
    assert(!bands.contains("3_under_1d"))
  }

  test("lateness: shares sum to 1 and the full profile is band-complete") {
    val prof = ingest.LatenessProfile.latenessProfile(spark, sf).collect()
    assert(prof.nonEmpty)
    val total = prof.map(_.getAs[Double]("share")).sum
    assert(math.abs(total - 1.0) < 1e-9)
    prof.foreach(r => assert(r.getAs[Long]("max_late_ms") >= 0L))
  }

  test("ohlc: candle identities hold per day") {
    val candles = analytics.DailyOhlc.dailyOhlc(spark, sf).collect()
    assert(candles.nonEmpty)
    candles.foreach { r =>
      val (o, h, l, c) = (r.getAs[Double]("open"), r.getAs[Double]("high"),
        r.getAs[Double]("low"), r.getAs[Double]("close"))
      assert(l <= o && o <= h, s"open outside [low, high] on ${r.get(0)}")
      assert(l <= c && c <= h, s"close outside [low, high] on ${r.get(0)}")
      assert(r.getAs[Long]("n_events") > 0)
    }
    // days are disjoint and the candle count matches the distinct days
    val days = candles.map(_.getAs[String]("day"))
    assert(days.distinct.length == days.length)
  }
}
