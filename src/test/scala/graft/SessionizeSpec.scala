package graft

import graft.streaming.Sessionize
import graft.streaming.Sessionize.{Ev, SessionState}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.GraftTestState

import java.nio.file.Files
import java.sql.Timestamp

/** Sessionization semantics: batch session_window invariants (the value
  * check is the DuckDB gaps-and-islands oracle), the custom-state assembler
  * at unit level, and streaming/batch parity for closed sessions.
  */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("batch sessions: gap-consistent, event-conserving") {
    val sessions = Sessionize.sessions(spark, sf).collect()
    val totalEvents = sessions.map(_.getLong(3)).sum
    assert(totalEvents == Tables.events(spark, sf).count())
    // end = last event + gap ⇒ end − start ≥ gap
    sessions.foreach { r =>
      val span = r.getTimestamp(2).getTime - r.getTimestamp(1).getTime
      assert(span >= Sessionize.GapMinutes * 60000L)
    }
    // sessions of one user never overlap (gap merge is maximal)
    sessions.groupBy(_.getLong(0)).values.foreach { g =>
      val sorted = g.sortBy(_.getTimestamp(1).getTime)
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(b.getTimestamp(1).getTime >= a.getTimestamp(2).getTime,
            "next session starts after previous end (else they'd have merged)")
        case _ =>
      }
    }
  }

  test("assembler closes on gap and accumulates within gap (unit)") {
    val t0 = 1700000000000000L // epoch micros
    def ev(offMin: Long, v: Double) =
      Ev(7L, new Timestamp((t0 + offMin * 60000000L) / 1000),
        t0 + offMin * 60000000L, v)
    val state = GraftTestState.forStreaming[SessionState](t0 / 1000)
    val out = Sessionize.assemble(7L,
      Iterator(ev(0, 1.0), ev(10, 2.0), ev(29, 3.0), ev(90, 4.0)), state).toList
    // first three merge (gaps 10, 19 min); the 90-min event opens a new session
    assert(out.length == 1)
    assert(out.head.n_events == 3 && math.abs(out.head.total_value - 6.0) < 1e-9)
    assert(state.get.n == 1 && state.get.total == 4.0, "fourth event left open in state")
  }

  test("streaming sessions equal batch sessions for closed sessions") {
    val src = Files.createTempDirectory("sess-src")
    val out = Files.createTempDirectory("sess-out").toString
    val ckpt = Files.createTempDirectory("sess-ckpt").toString
    Tables.events(spark, sf).write.mode("overwrite")
      .parquet(src.resolve("batch1").toString)
    Sessionize.streamSessions(spark, src.toString + "/*", out, ckpt)
      .awaitTermination()
    val streamed = spark.read.parquet(out)
      .select($"user_id", $"session_start_us", $"n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batch = Sessionize.sessions(spark, sf)
      .select($"user_id", unix_micros($"session_start"), $"n_events").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // every streamed (closed) session must exist identically in batch;
    // sessions still open in state at end-of-stream are the only misses
    assert(streamed.nonEmpty)
    assert(streamed.subsetOf(batch),
      s"streamed sessions diverge: ${(streamed -- batch).take(3)}")
    val missing = batch -- streamed
    // at most one open (unemitted) session per user
    val users = missing.groupBy(_._1)
    assert(users.values.forall(_.size <= 1),
      "only the final open session per user may be unemitted")
  }
}
