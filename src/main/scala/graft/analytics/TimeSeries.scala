package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series shapes over the events stream beyond the window family in
  * [[WindowExtras]]: the seasonal (hour-of-day) profile, cumulative distinct
  * users, and equi-depth value binning — the ops behind "is today normal?"
  * dashboards.
  *
  * Determinism: averages are exact-decimal sums divided once; shares are
  * single divisions of integer counts; bin boundaries come from `ntile`
  * over a total order — all hash-identical across engines.
  */
object TimeSeries {

  /** Equi-depth bins per event type. */
  val Bins = 8

  /** Hour-of-day seasonal profile per event type: row count, exact-decimal
    * mean value, and each hour's share of the type's total traffic.
    *
    * Scale shape: one aggregate keyed (type, hour) — at most 24×|types|
    * groups, so partial aggregation collapses everything map-side; the
    * share join is against a |types|-row total (broadcast).
    */
  def seasonalProfile(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val hourly = Tables.events(spark, dir)
      // null-rejecting on the grouping/measure columns: Spark and DuckDB
      // disagree on NULL sort/group placement, so dirty rows are excluded
      // EXPLICITLY on both engines rather than by accident of defaults
      .filter($"ts".isNotNull && $"event_type".isNotNull && $"value".isNotNull)
      .select($"event_type", hour($"ts").as("hh"),
        $"value".cast("decimal(12,2)").as("v"))
      .groupBy($"event_type", $"hh")
      .agg(count(lit(1)).as("n"), sum($"v").as("v_sum"))
    val totals = hourly.groupBy($"event_type").agg(sum($"n").as("type_total"))
    hourly.join(broadcast(totals), "event_type")
      .select($"event_type", $"hh", $"n",
        ($"v_sum".cast("double") / $"n").as("avg_value"),
        ($"n" * lit(1.0) / $"type_total").as("hour_share"))
      .orderBy($"event_type", $"hh")
  }

  /** Cumulative distinct users by date: each user counts once, on their
    * first-seen date; a running sum over the ~bounded date spine gives the
    * cumulative curve. This is THE scale-safe way to a "total users to
    * date" series — the naive `COUNT(DISTINCT user) OVER (ORDER BY date)`
    * re-scans every prior day per row, while first-seen + running sum is
    * one aggregate plus a window over |dates| rows.
    */
  def cumulativeUniques(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val firstSeen = Tables.events(spark, dir)
      // a user whose every ts is NULL would get a NULL first-seen date and
      // land on opposite ends of the two engines' date orders — filter,
      // mirrored in the oracle
      .filter($"ts".isNotNull && $"user_id".isNotNull)
      .groupBy($"user_id")
      .agg(to_date(min($"ts")).as("event_date"))
    val daily = firstSeen.groupBy($"event_date")
      .agg(count(lit(1)).as("n_new"))
    val w = Window.orderBy($"event_date")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily
      .select($"event_date", $"n_new",
        sum($"n_new").over(w).as("cum_users"))
      .orderBy($"event_date")
  }

  /** Equi-depth (ntile) value bins per event type: [[Bins]] buckets of equal
    * row count, each reported with its [min, max] value span and size.
    * Total order (value, event_id) makes tile assignment deterministic.
    *
    * Scale note: the window partitions by event type, so no global sort —
    * each type's rows sort within their shuffle partition. For a single
    * giant key, the two-phase variant (sampled quantile boundaries +
    * map-side bucketing, as `wh_zorder_stats` does for its ranks) replaces
    * the exact tile at the cost of approximate boundaries.
    */
  def equidepthBins(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val w = Window.partitionBy($"event_type").orderBy($"value", $"event_id")
    Tables.events(spark, dir)
      // NULLs sort first in Spark, last in DuckDB — tile assignment must
      // never see one
      .filter($"event_type".isNotNull && $"event_id".isNotNull &&
        $"value".isNotNull)
      .select($"event_type", $"event_id", $"value")
      .withColumn("bin", ntile(Bins).over(w))
      .groupBy($"event_type", $"bin")
      .agg(count(lit(1)).as("n"),
        min($"value").as("lo"), max($"value").as("hi"))
      .orderBy($"event_type", $"bin")
  }

  /** Monthly revenue rebased to the first period = 100 — the indexed-series
    * shape every "growth since launch" chart is. Revenue accumulates as
    * exact DECIMAL; the rebase is two fixed-shape IEEE ops against the
    * `first_value` of the bounded month spine.
    *
    * Scale shape: the monthly rollup collapses map-side; the unpartitioned
    * `first_value` window runs over |months| rows — a plan constant, not a
    * data-scale sort.
    */
  def rebaseIndex(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val monthly = Tables.orders(spark, dir)
      .groupBy((year($"o_orderdate") * 100 + month($"o_orderdate")).as("ym"))
      .agg(sum($"o_totalprice".cast("decimal(18,2)")).as("rev"))
    val w = Window.orderBy($"ym")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    monthly
      .withColumn("first_rev", first($"rev").over(w))
      .select($"ym", $"rev".cast("double").as("revenue"),
        (($"rev".cast("double") / $"first_rev".cast("double")) * lit(100.0))
          .as("idx"))
      .orderBy($"ym")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_seasonal_profile" -> (seasonalProfile _),
    "ts_rebase_index" -> (rebaseIndex _),
    "win_cumulative_uniques" -> (cumulativeUniques _),
    "agg_equidepth_bins" -> (equidepthBins _))

  val oracle: Map[String, String] = Map(
    "ts_rebase_index" -> """WITH monthly AS (
  SELECT (year(o_orderdate)::INT * 100 + month(o_orderdate)::INT) AS ym,
         sum(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
  FROM orders GROUP BY 1),
based AS (
  SELECT ym, rev,
         first_value(rev) OVER (ORDER BY ym
                                ROWS BETWEEN UNBOUNDED PRECEDING
                                AND CURRENT ROW) AS first_rev
  FROM monthly)
SELECT ym, CAST(rev AS DOUBLE) AS revenue,
       (CAST(rev AS DOUBLE) / CAST(first_rev AS DOUBLE)) * 100.0 AS idx
FROM based
ORDER BY ym""",

    "ts_seasonal_profile" -> """WITH hourly AS (
  SELECT event_type, hour(ts)::INT AS hh, count(*)::BIGINT AS n,
         sum(CAST(value AS DECIMAL(12,2))) AS v_sum
  FROM events
  WHERE ts IS NOT NULL AND event_type IS NOT NULL AND value IS NOT NULL
  GROUP BY 1, 2),
totals AS (SELECT event_type, sum(n)::BIGINT AS type_total FROM hourly GROUP BY 1)
SELECT h.event_type, h.hh, h.n,
       CAST(v_sum AS DOUBLE) / h.n AS avg_value,
       h.n * 1.0 / t.type_total AS hour_share
FROM hourly h JOIN totals t USING (event_type)
ORDER BY event_type, hh""",

    "win_cumulative_uniques" -> """WITH first_seen AS (
  SELECT user_id, CAST(min(ts) AS DATE) AS event_date
  FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL
  GROUP BY 1),
daily AS (
  SELECT event_date, count(*)::BIGINT AS n_new FROM first_seen GROUP BY 1)
SELECT event_date, n_new,
       CAST(sum(n_new) OVER (ORDER BY event_date
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_users
FROM daily
ORDER BY event_date""",

    "agg_equidepth_bins" -> s"""WITH binned AS (
  SELECT event_type, value,
         ntile($Bins) OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS bin
  FROM events
  WHERE event_type IS NOT NULL AND event_id IS NOT NULL
    AND value IS NOT NULL)
SELECT event_type, bin::INT AS bin, count(*)::BIGINT AS n,
       min(value) AS lo, max(value) AS hi
FROM binned
GROUP BY event_type, bin
ORDER BY event_type, bin""")
}
