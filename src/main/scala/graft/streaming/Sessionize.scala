package graft.streaming

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}

/** User-session assembly over the events stream — the stateful-operator
  * extension (the reference has no session concept; a usage pipeline at
  * scale needs one, and it exercises Spark's two session mechanisms).
  *
  * Two implementations, deliberately:
  *  - [[sessions]]: the declarative `session_window` aggregate (Spark-first:
  *    Catalyst plans the merge, AQE handles skew) — batch, oracle-checked
  *    against a gaps-and-islands SQL twin.
  *  - [[streamSessions]]: `flatMapGroupsWithState` with explicit per-user
  *    state and event-time timeout — the custom-state shape for logic a
  *    windowed aggregate cannot express (per-session ML features, abandoned-
  *    cart triggers, ...). Closed sessions emit on gap or watermark timeout.
  *
  * Gap: 30 minutes. session_end = last event + gap (both paths, and the
  * oracle). Values are summed as DECIMAL(12,2): float sums are
  * order-dependent across engines; decimal addition is exact and
  * associative, so the oracle hash-compare stays deterministic.
  *
  * Scale notes: both paths shuffle once on user_id; state (streaming) is one
  * open session per active user, bounded by the watermark horizon.
  */
object Sessionize {

  val GapMinutes = 30

  /** Batch sessionization via the built-in session_window aggregate. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.events(spark, dir)
      .groupBy(session_window($"ts", s"$GapMinutes minutes"), $"user_id")
      .agg(count(lit(1)).as("n_events"),
        // exact decimal accumulation, double on the wire (pandas Decimal vs
        // DuckDB float64 otherwise hash-mismatch; sums ≪ 2^53 so exact)
        sum($"value".cast("decimal(12,2)")).cast("double").as("total_value"))
      .select($"user_id", $"session_window.start".as("session_start"),
        $"session_window.end".as("session_end"), $"n_events", $"total_value")
      .orderBy($"user_id", $"session_start")
  }

  val oracle: Map[String, String] = Map(
    "etl_sessionize" -> s"""WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   >= INTERVAL $GapMinutes MINUTE OR
                   lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events),
ids AS (
  SELECT *, sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
             ROWS UNBOUNDED PRECEDING) AS session_id
  FROM marked)
SELECT user_id, min(ts) AS session_start,
       max(ts) + INTERVAL $GapMinutes MINUTE AS session_end,
       count(*)::BIGINT AS n_events,
       sum(value::DECIMAL(12,2))::DOUBLE AS total_value
FROM ids GROUP BY user_id, session_id
ORDER BY user_id, session_start""")

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "etl_sessionize" -> (sessions _))

  // ---- custom-state streaming variant ----

  final case class Ev(user_id: Long, ts: java.sql.Timestamp, value: Double)
  final case class SessionState(start: Long, last: Long, n: Long, total: Double)
  final case class Session(user_id: Long, session_start: java.sql.Timestamp,
      session_end: java.sql.Timestamp, n_events: Long, total_value: Double)

  private val gapMs = GapMinutes * 60 * 1000L

  /** Per-user session assembly: merge in-gap events into the open session,
    * emit a closed session whenever a gap or the event-time timeout passes.
    */
  private[graft] def assemble(userId: Long, events: Iterator[Ev],
      state: GroupState[SessionState]): Iterator[Session] = {
    def close(s: SessionState) = Session(userId,
      new java.sql.Timestamp(s.start), new java.sql.Timestamp(s.last + gapMs),
      s.n, s.total)
    if (state.hasTimedOut) {
      val out = state.getOption.map(close).iterator
      state.remove()
      out
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      var open = state.getOption
      val closed = Seq.newBuilder[Session]
      for (e <- sorted) {
        val t = e.ts.getTime
        open match {
          // half-open like session_window: an event exactly gap after the
          // last one starts a NEW session
          case Some(s) if t - s.last < gapMs =>
            open = Some(SessionState(s.start, math.max(s.last, t), s.n + 1,
              s.total + e.value))
          case Some(s) =>
            closed += close(s)
            open = Some(SessionState(t, t, 1, e.value))
          case None =>
            open = Some(SessionState(t, t, 1, e.value))
        }
      }
      open.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.last + gapMs)
      }
      closed.result().iterator
    }
  }

  /** Streaming sessionizer over a watched directory of event files. */
  def streamSessions(spark: SparkSession, srcDir: String, outDir: String,
      checkpointDir: String): StreamingQuery = {
    import spark.implicits._
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING")
    spark.readStream.schema(schema).parquet(srcDir)
      .withWatermark("ts", "1 hour")
      .select($"user_id", $"ts", $"value").as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(assemble)
      .writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
  }
}
