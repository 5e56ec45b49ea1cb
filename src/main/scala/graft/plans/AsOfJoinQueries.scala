package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered queries for the native [[AsOfJoinExec]] operator — the same
  * attribution semantics as `join_asof_attribution` (every purchase enriched
  * with the user's latest at-or-before click), but executed by the custom
  * merge exec instead of the union-window composition, plus a tolerance
  * variant no built-in composition expresses as cheaply. The DuckDB oracle
  * is its native `ASOF LEFT JOIN` — an independent engine's implementation
  * of the operator, the strongest equivalence check available.
  *
  * Clicks are pre-collapsed to one per (user, ts) — max event_id — so tie
  * resolution is deterministic in both engines. Times ride as epoch
  * microseconds (the exec's LongType contract); the delay output stays in
  * integer microseconds end-to-end, so the hash compare is exact.
  */
object AsOfJoinQueries {

  /** Tolerance for the bounded variant: 2 days in epoch micros. Chosen to
    * split the observed delay distribution (median ~30 h, p90 ~4 days), so
    * the CASE actually fires both ways. ONE constant, interpolated into
    * both engines.
    */
  val TolUs: Long = 2L * 86400L * 1000000L

  private def asofBase(spark: SparkSession, dir: String,
      toleranceUs: Option[Long]): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).filter($"ts".isNotNull)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
      .select($"user_id".as("c_uid"), unix_micros($"ts").as("c_us"),
        $"click_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
    AsOfJoin.asofLeft(purchases, clicks,
        leftKey = "user_id", leftTime = "p_us",
        rightKey = "c_uid", rightTime = "c_us", toleranceUs = toleranceUs)
      .select($"event_id", $"user_id", $"click_id".as("prior_click_id"),
        coalesce($"p_us" - $"c_us", lit(-1L)).as("delay_us"))
      .orderBy($"event_id")
  }

  def asofExec(spark: SparkSession, dir: String): DataFrame =
    asofBase(spark, dir, None)

  /** Filter bound for [[asofFiltered]] — ONE definition, both engines. */
  val FilterMaxUser = 75L

  /** A predicate applied ABOVE the as-of join, as a consumer would write
    * it; [[PushFilterThroughAsOf]] moves it into both children, so the
    * parquet scans read one user-slice instead of everything (spec-pinned:
    * both scans carry the pushed user_id predicate). The oracle applies
    * the same filter post-join — the equivalence that makes the pushdown
    * sound is exactly what the hash compares.
    */
  def asofFiltered(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    asofBase(spark, dir, None).filter($"user_id" <= FilterMaxUser)
  }

  def asofTolerance(spark: SparkSession, dir: String): DataFrame =
    asofBase(spark, dir, Some(TolUs))

  /** Forward as-of: each click enriched with the user's NEXT purchase
    * at-or-after it — time-to-conversion, the attribution mirror of
    * [[asofExec]]. Both sides collapse to one row per (user, ts) so the
    * equal-timestamp pick is deterministic in both engines.
    */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).filter($"ts".isNotNull)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
      .select($"user_id", unix_micros($"ts").as("c_us"), $"click_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("purchase_id"))
      .select($"user_id".as("p_uid"), unix_micros($"ts").as("p_us"),
        $"purchase_id")
    AsOfJoin.asofForwardLeft(clicks, purchases,
        leftKey = "user_id", leftTime = "c_us",
        rightKey = "p_uid", rightTime = "p_us")
      .select($"click_id", $"user_id",
        $"purchase_id".as("next_purchase_id"),
        coalesce($"p_us" - $"c_us", lit(-1L)).as("wait_us"))
      .orderBy($"click_id")
  }

  private val oraclePrelude = """WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1, 2),
purchases AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL),
j AS (
  SELECT p.event_id, p.user_id, c.click_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS d
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id AND p.ts >= c.ts)
"""

  /** Epoch micros per UTC day — ONE definition, both engines. */
  val DayUs: Long = 86400L * 1000000L

  /** Compound-key as-of: the latest click at-or-before the purchase
    * WITHIN THE SAME UTC DAY — the windowed form of [[asofExec]], keyed
    * (user_id, day). The day number is integer division of the same epoch
    * micros the merge orders by, so the bucket boundary is exact in both
    * engines; a purchase whose nearest click is yesterday stays unmatched
    * even though the plain as-of would take it.
    */
  def asofSameDay(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).filter($"ts".isNotNull)
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"user_id", $"ts").agg(max($"event_id").as("click_id"))
      .select($"user_id".as("c_uid"), unix_micros($"ts").as("c_us"),
        $"click_id")
      // exact FLOOR division (subtract the non-negative pmod remainder,
      // then the division is exact): Spark's DIV truncates toward zero
      // while the oracle's // floors, and the two disagree on negative
      // (pre-1970) epoch micros — the floor form agrees on all inputs
      .withColumn("c_day", expr(s"(c_us - pmod(c_us, ${DayUs}L)) DIV ${DayUs}L"))
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"user_id", unix_micros($"ts").as("p_us"))
      .withColumn("p_day", expr(s"(p_us - pmod(p_us, ${DayUs}L)) DIV ${DayUs}L"))
    AsOfJoin.asofLeftKeys(purchases, clicks,
        leftKeys = Seq("user_id", "p_day"), leftTime = "p_us",
        rightKeys = Seq("c_uid", "c_day"), rightTime = "c_us")
      .select($"event_id", $"user_id",
        $"click_id".as("same_day_click_id"),
        coalesce($"p_us" - $"c_us", lit(-1L)).as("delay_us"))
      .orderBy($"event_id")
  }

  /** Modulus for the planted-skew key: users whose floor-mod residue is
    * below `SkewResidues - 1` (~80 % of rows) collapse onto ONE hot key.
    * ONE definition, both engines — the oracle wraps DuckDB's truncated %
    * into the same floor-mod as Spark's pmod, so a (hypothetical)
    * negative user_id cannot split the two engines' key assignment.
    */
  val SkewResidues = 5L

  /** The skewed attribution feed: clicks/purchases re-keyed so ~80 % of
    * rows share a single as-of key — the shape where the exec's O(1)
    * buffered-row merge separates from the union-window composition (whose
    * hot window partition must SORT clicks+purchases interleaved and carry
    * the running-last state through it). Both query forms below return
    * identical rows; Bench profiles them as the `asof_skew` ledger.
    */
  private def skewFeed(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).filter($"ts".isNotNull)
      .withColumn("sk",
        when(pmod($"user_id", lit(SkewResidues)) < SkewResidues - 1, lit(0L))
          .otherwise($"user_id"))
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"sk", $"ts").agg(max($"event_id").as("click_id"))
      .select($"sk".as("c_sk"), unix_micros($"ts").as("c_us"), $"click_id")
    val purchases = ev.filter($"event_type" === "purchase")
      .select($"event_id", $"sk", unix_micros($"ts").as("p_us"))
    (purchases, clicks)
  }

  /** Hot-key attribution through the native exec — per-partition state is
    * ONE buffered row no matter how many rows the hot key holds.
    */
  def asofSkewExec(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (purchases, clicks) = skewFeed(spark, dir)
    AsOfJoin.asofLeft(purchases, clicks,
        leftKey = "sk", leftTime = "p_us",
        rightKey = "c_sk", rightTime = "c_us")
      .select($"event_id", $"sk", $"click_id".as("prior_click_id"),
        coalesce($"p_us" - $"c_us", lit(-1L)).as("delay_us"))
      .orderBy($"event_id")
  }

  /** The same semantics as the union-window composition: tag, union, one
    * window sort per key, running `last` carry — the hot key's window
    * partition holds ~80 % of BOTH sides interleaved, which is exactly the
    * cost the native exec avoids.
    */
  def asofSkewWindow(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (purchases, clicks) = skewFeed(spark, dir)
    val cTagged = clicks.select($"c_sk".as("sk"), $"c_us".as("us"),
      lit(0).as("tag"), $"click_id", $"c_us".as("src_c_us"),
      lit(null).cast("bigint").as("event_id"))
    val pTagged = purchases.select($"sk", $"p_us".as("us"),
      lit(1).as("tag"), lit(null).cast("bigint").as("click_id"),
      lit(null).cast("bigint").as("src_c_us"), $"event_id")
    val w = Window.partitionBy($"sk").orderBy($"us", $"tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cTagged.unionByName(pTagged)
      .withColumn("prior_click_id", last($"click_id", ignoreNulls = true).over(w))
      .withColumn("prior_c_us", last($"src_c_us", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"event_id", $"sk", $"prior_click_id",
        coalesce($"us" - $"prior_c_us", lit(-1L)).as("delay_us"))
      .orderBy($"event_id")
  }

  /** Amplification for the LEDGER-ONLY skew pair: the oracle-checked skew
    * fixtures above stay at raw sf size (20k purchases — sub-second, all
    * session floor), while the bench `asof_skew` ledger runs this
    * ×[[AmpFactor]] replicated feed with a ~95%-one-key skew. The two
    * forms are equivalence-pinned against each other in AsOfJoinSpec at
    * sf0.001 — same rows, no DuckDB needed, so the amplification costs
    * the oracle nothing.
    *
    * MEASURED FINDING (r12, and why the ledger publishes parity): on a
    * one-sided hot key the two plans cost the SAME, intrinsically — at
    * ×200 amplification (4M purchases, ~95% one key) native read 3.70s vs
    * composed 3.57s on an idle box. Both plans' wall is the hot
    * partition's SORT of the purchase side (the exec sorts each child
    * within the merge task; the composition sorts the union in one window
    * task — purchases + 19k interleaved clicks, i.e. the same ~4M-row
    * sort), and both carry O(1) running state through it (the exec's one
    * buffered row; the window's streaming UnboundedPreceding→CurrentRow
    * frame). The composition's extra work — the interleaved right rows
    * and two running-`last` columns — is noise against the shared sort.
    * The exec's real edges stay where the other entries price them:
    * tolerance/forward/compound-key variants no single window expresses,
    * and a smaller unified-schema exchange. The r10 "native wins skew"
    * reading (0.34s vs 0.49s) was sub-second session-floor noise, not a
    * plan property — this ledger now carries per-arm spread so that
    * misreading cannot recur.
    */
  val AmpFactor = 50
  private val AmpResidues = 20L // pmod(user_id, 20) < 19 → one hot key (~95%)

  private def skewFeedAmp(spark: SparkSession, dir: String)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    val ev = Tables.events(spark, dir).filter($"ts".isNotNull)
      .withColumn("sk",
        when(pmod($"user_id", lit(AmpResidues)) < AmpResidues - 1, lit(0L))
          .otherwise($"user_id"))
    val clicks = ev.filter($"event_type" === "click")
      .groupBy($"sk", $"ts").agg(max($"event_id").as("click_id"))
      .select($"sk".as("c_sk"), unix_micros($"ts").as("c_us"), $"click_id")
    // each purchase ×AmpFactor with a distinct id and a <AmpFactor-µs time
    // shift (keeps per-row work honest: no two replicas are equal rows)
    val purchases = ev.filter($"event_type" === "purchase")
      .crossJoin(broadcast(spark.range(AmpFactor).select($"id".as("rep"))))
      .select(($"event_id" * AmpFactor + $"rep").as("event_id"), $"sk",
        (unix_micros($"ts") + $"rep").as("p_us"))
    (purchases, clicks)
  }

  /** Ledger-only: no final global sort (it would add an identical cost to
    * both arms and dilute the ratio the pair exists to measure).
    */
  def asofSkewExecAmp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val (purchases, clicks) = skewFeedAmp(spark, dir)
    AsOfJoin.asofLeft(purchases, clicks,
        leftKey = "sk", leftTime = "p_us",
        rightKey = "c_sk", rightTime = "c_us")
      .select($"event_id", $"sk", $"click_id".as("prior_click_id"),
        coalesce($"p_us" - $"c_us", lit(-1L)).as("delay_us"))
  }

  def asofSkewWindowAmp(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val (purchases, clicks) = skewFeedAmp(spark, dir)
    val cTagged = clicks.select($"c_sk".as("sk"), $"c_us".as("us"),
      lit(0).as("tag"), $"click_id", $"c_us".as("src_c_us"),
      lit(null).cast("bigint").as("event_id"))
    val pTagged = purchases.select($"sk", $"p_us".as("us"),
      lit(1).as("tag"), lit(null).cast("bigint").as("click_id"),
      lit(null).cast("bigint").as("src_c_us"), $"event_id")
    val w = Window.partitionBy($"sk").orderBy($"us", $"tag")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cTagged.unionByName(pTagged)
      .withColumn("prior_click_id", last($"click_id", ignoreNulls = true).over(w))
      .withColumn("prior_c_us", last($"src_c_us", ignoreNulls = true).over(w))
      .filter($"tag" === 1)
      .select($"event_id", $"sk", $"prior_click_id",
        coalesce($"us" - $"prior_c_us", lit(-1L)).as("delay_us"))
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_asof_exec" -> (asofExec _),
    "join_asof_tolerance" -> (asofTolerance _),
    "join_asof_forward" -> (asofForward _),
    "join_asof_filtered" -> (asofFiltered _),
    "join_asof_same_day" -> (asofSameDay _),
    "join_asof_skew_exec" -> (asofSkewExec _),
    "join_asof_skew_window" -> (asofSkewWindow _))

  /** ONE oracle for both skew forms — they must return identical rows,
    * which is itself the equivalence the pair exists to price.
    */
  private val skewOracle = s"""WITH ev AS (
  SELECT *, CASE WHEN ((user_id % $SkewResidues) + $SkewResidues)
                      % $SkewResidues < ${SkewResidues - 1}
                 THEN 0 ELSE user_id END AS sk
  FROM events WHERE ts IS NOT NULL),
clicks AS (
  SELECT sk, ts, max(event_id) AS click_id
  FROM ev WHERE event_type = 'click' GROUP BY 1, 2),
purchases AS (
  SELECT event_id, sk, ts FROM ev WHERE event_type = 'purchase')
SELECT p.event_id, p.sk, c.click_id AS prior_click_id,
       coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1)::BIGINT AS delay_us
FROM purchases p ASOF LEFT JOIN clicks c
  ON p.sk = c.sk AND p.ts >= c.ts
ORDER BY p.event_id"""

  val oracle: Map[String, String] = Map(
    "join_asof_exec" -> (oraclePrelude + """SELECT event_id, user_id,
       click_id AS prior_click_id,
       coalesce(d, -1)::BIGINT AS delay_us
FROM j ORDER BY event_id"""),

    // tolerance = post-filter on the single ASOF candidate: the pick is the
    // NEWEST qualifying right row, so if IT exceeds the bound every other
    // candidate does too — exact equivalence, not an approximation
    "join_asof_tolerance" -> (oraclePrelude + s"""SELECT event_id, user_id,
       CASE WHEN d IS NOT NULL AND d <= $TolUs THEN click_id END
         AS prior_click_id,
       coalesce(CASE WHEN d <= $TolUs THEN d END, -1)::BIGINT AS delay_us
FROM j ORDER BY event_id"""),

    "join_asof_forward" -> """WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1, 2),
purchases AS (
  SELECT user_id, ts, max(event_id) AS purchase_id
  FROM events WHERE event_type = 'purchase' AND ts IS NOT NULL GROUP BY 1, 2)
SELECT c.click_id, c.user_id, p.purchase_id AS next_purchase_id,
       coalesce(epoch_us(p.ts) - epoch_us(c.ts), -1)::BIGINT AS wait_us
FROM clicks c ASOF LEFT JOIN purchases p
  ON c.user_id = p.user_id AND c.ts <= p.ts
ORDER BY c.click_id""",

    // the post-join form of the same predicate: pushdown must not change
    // the result, so the oracle deliberately does NOT pre-filter
    "join_asof_filtered" -> (oraclePrelude + s"""SELECT event_id, user_id,
       click_id AS prior_click_id,
       coalesce(d, -1)::BIGINT AS delay_us
FROM j WHERE user_id <= $FilterMaxUser ORDER BY event_id"""),

    "join_asof_skew_exec" -> skewOracle,
    "join_asof_skew_window" -> skewOracle,

    // DuckDB's ASOF accepts extra equality conditions (even on
    // expressions): same generator-day bucket, same >= time bound
    "join_asof_same_day" -> s"""WITH clicks AS (
  SELECT user_id, ts, max(event_id) AS click_id
  FROM events WHERE event_type = 'click' AND ts IS NOT NULL GROUP BY 1, 2),
purchases AS (
  SELECT event_id, user_id, ts FROM events
  WHERE event_type = 'purchase' AND ts IS NOT NULL),
j AS (
  SELECT p.event_id, p.user_id, c.click_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS d
  FROM purchases p ASOF LEFT JOIN clicks c
    ON p.user_id = c.user_id
   AND (epoch_us(p.ts) // $DayUs) = (epoch_us(c.ts) // $DayUs)
   AND p.ts >= c.ts)
SELECT event_id, user_id, click_id AS same_day_click_id,
       coalesce(d, -1)::BIGINT AS delay_us
FROM j ORDER BY event_id""")
}
