package graft

import graft.streaming.IncrementalIngest
import org.apache.spark.sql.functions._

import java.nio.file.{Files, Path}

/** Streaming incremental-ingest semantics (SURVEY §2.9): catch-up batches,
  * cross-run idempotence via checkpoint, duplicate-delivery protection, and
  * windowed-aggregation parity with the equivalent batch rollup.
  */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private def landEvents(dst: Path, name: String): Unit = {
    // land the micros-normalized events as a source file
    Tables.events(spark, sf).write.mode("overwrite")
      .parquet(dst.resolve(name).toString)
  }

  test("stage: catch-up run lands all events once; re-run lands nothing new") {
    val src = Files.createTempDirectory("stream-src")
    val staging = tmp("stream-staging")
    val ckpt = tmp("stream-ckpt")
    landEvents(src, "batch1")

    IncrementalIngest.stage(spark, src.toString + "/*", staging, ckpt)
      .awaitTermination()
    val n0 = Tables.events(spark, sf).count()
    assert(IncrementalIngest.staged(spark, staging).count() == n0)

    // second run with no new files: checkpoint makes it a no-op
    IncrementalIngest.stage(spark, src.toString + "/*", staging, ckpt)
      .awaitTermination()
    assert(IncrementalIngest.staged(spark, staging).count() == n0)

    // duplicate delivery: the same events land again as a new file —
    // dedup state + watermark drop every one of them
    landEvents(src, "batch2_redelivery")
    IncrementalIngest.stage(spark, src.toString + "/*", staging, ckpt)
      .awaitTermination()
    val staged = IncrementalIngest.staged(spark, staging)
    assert(staged.count() == n0)
    assert(staged.select($"event_id").distinct().count() == n0)
  }

  test("kill mid-run + restart from checkpoint = exactly-once, equals the one-shot run") {
    // the reference's headline guarantee — "the pipeline can be run
    // multiple times safely" (README.md:202) — under the harshest version:
    // a catch-up run KILLED between micro-batches, then restarted from its
    // checkpoint. Offsets are WAL'd before a batch runs and the parquet
    // sink registers files per-batch in its manifest, so an interrupted
    // batch replays on restart without double-landing — the restarted
    // stream must equal a never-killed control run exactly.
    val src = Files.createTempDirectory("restart-src")
    val ev = Tables.events(spark, sf)
    for (i <- 0 until 3) // three disjoint slices = three files = three batches
      ev.filter($"event_id" % 3 === i).write.mode("overwrite")
        .parquet(src.resolve(s"slice$i").toString)

    // control: one uninterrupted run on its own checkpoint
    val (ctlStaging, ctlCkpt) = (tmp("restart-ctl-out"), tmp("restart-ctl-ckpt"))
    IncrementalIngest.stage(spark, src.toString + "/*", ctlStaging, ctlCkpt,
      maxFilesPerTrigger = Some(1)).awaitTermination()

    // victim: same source, stopped as soon as the first batch commits
    val (staging, ckpt) = (tmp("restart-out"), tmp("restart-ckpt"))
    val q = IncrementalIngest.stage(spark, src.toString + "/*", staging, ckpt,
      maxFilesPerTrigger = Some(1))
    while (q.isActive && !q.recentProgress.exists(_.numInputRows > 0))
      Thread.sleep(5)
    q.stop(); q.awaitTermination()

    // restart from the same checkpoint: replays any uncommitted batch and
    // finishes the remainder — never re-lands a committed one
    IncrementalIngest.stage(spark, src.toString + "/*", staging, ckpt,
      maxFilesPerTrigger = Some(1)).awaitTermination()

    val out = IncrementalIngest.staged(spark, staging)
    val ctl = IncrementalIngest.staged(spark, ctlStaging)
    assert(out.count() == ctl.count(), "restarted run must land exactly the control's rows")
    assert(out.select($"event_id").distinct().count() == out.count(),
      "no event may land twice across the kill/restart boundary")
    assert(out.select($"event_id").except(ctl.select($"event_id")).isEmpty &&
      ctl.select($"event_id").except(out.select($"event_id")).isEmpty,
      "restarted run and one-shot run must be set-identical")
  }

  test("streaming scd2 maintenance: foreachBatch merge versions once, replays are no-ops") {
    import graft.streaming.DimMaintain
    import java.sql.Date
    val src = Files.createTempDirectory("dimstream-src")
    val dimDir = tmp("dimstream-dim")
    val ckpt = tmp("dimstream-ckpt")
    def changes(rows: Seq[(Long, String, String, String, String)]) =
      rows.toDF("patient_id", "age_group", "sex", "location", "d")
        .withColumn("effective_date", $"d".cast("date")).drop("d")

    // batch 1: three fresh keys
    changes(Seq((1L, "18-30", "F", "EUROPE", "1995-01-01"),
      (2L, "31-50", "M", "ASIA", "1995-01-01"),
      (3L, "51-70", "F", "AFRICA", "1995-01-01")))
      .write.mode("overwrite").parquet(src.resolve("b1").toString)
    DimMaintain.maintain(spark, src.toString + "/*", dimDir, ckpt).awaitTermination()
    val d1 = DimMaintain.dim(spark, dimDir)
    assert(d1.count() == 3 && d1.filter($"is_current" && $"version" === 1).count() == 3)

    // batch 2: key 1 relocates, key 4 arrives, key 2 re-delivers UNCHANGED
    val b2 = changes(Seq((1L, "18-30", "F", "AMERICA", "1996-06-01"),
      (4L, "71+", "M", "EUROPE", "1996-06-01"),
      (2L, "31-50", "M", "ASIA", "1996-06-01")))
    b2.write.mode("overwrite").parquet(src.resolve("b2").toString)
    DimMaintain.maintain(spark, src.toString + "/*", dimDir, ckpt).awaitTermination()
    val d2 = DimMaintain.dim(spark, dimDir)
    assert(d2.count() == 5) // 3 + insert(4) + new version of 1
    val k1 = d2.filter($"patient_id" === 1).orderBy($"version").collect()
    assert(k1.length == 2)
    assert(!k1(0).getBoolean(7) && k1(0).getDate(6) == Date.valueOf("1996-06-01"))
    assert(k1(1).getBoolean(7) && k1(1).getInt(4) == 2
      && k1(1).getString(3) == "AMERICA")
    // unchanged re-delivery did NOT version key 2
    assert(d2.filter($"patient_id" === 2).count() == 1)

    // checkpoint: re-running with no new files changes nothing
    DimMaintain.maintain(spark, src.toString + "/*", dimDir, ckpt).awaitTermination()
    assert(DimMaintain.dim(spark, dimDir).count() == 5)
    // crash-replay: applying the SAME batch again directly is a no-op
    DimMaintain.mergeBatch(spark, b2, dimDir, 99L)
    val d3 = DimMaintain.dim(spark, dimDir)
    assert(d3.count() == 5 && d3.filter($"is_current").count() == 4)

    // malformed (null date) and out-of-order (stale) changes are rejected:
    // key 1's current version starts 1996-06-01; a 1995 change must not
    // close it, and a null-date change must not version anything
    val bad = Seq(
      (1L, "18-30", "F", "ATLANTIS", Some("1995-01-01")),
      (2L, "31-50", "M", "NOWHERE", None))
      .toDF("patient_id", "age_group", "sex", "location", "d")
      .withColumn("effective_date", $"d".cast("date")).drop("d")
    DimMaintain.mergeBatch(spark, bad, dimDir, 100L)
    val d4 = DimMaintain.dim(spark, dimDir)
    assert(d4.count() == 5 && d4.filter($"is_current").count() == 4)
    assert(d4.filter($"patient_id" === 1 && $"is_current").head.getString(3)
      == "AMERICA")
  }

  test("streaming content dedup drops in-horizon re-deliveries under fresh ids") {
    val src = Files.createTempDirectory("stream-src4")
    val out = tmp("stream-out4")
    val ckpt = tmp("stream-ckpt4")
    // deterministic ingest time; re-delivered copies arrive under FRESH ids
    // but the SAME ingest time (in-horizon re-crawl)
    val docs = Tables.documents(spark, sf)
      .withColumn("ingest_ts",
        (lit(1704067200L) + pmod($"doc_id", lit(1000000L))).cast("timestamp"))
    val feed = docs.unionByName(
      docs.filter(pmod($"doc_id", lit(10)) === 0)
        .withColumn("doc_id", $"doc_id" + lit(1000000L)))
    feed.write.mode("overwrite").parquet(src.resolve("batch1").toString)

    IncrementalIngest.dedupDocs(spark, src.toString + "/*", out, ckpt)
      .awaitTermination()
    val landed = spark.read.parquet(out)
    val n = Tables.documents(spark, sf).count()
    // key-based dedup would keep every re-delivery (fresh doc_ids);
    // content dedup drops them all
    assert(landed.count() == n)
    assert(landed.select($"fingerprint").distinct().count() == n)
  }

  test("stream-static enrichment equals the batch left join") {
    val src = Files.createTempDirectory("enrich-src")
    val out = tmp("enrich-out")
    val ckpt = tmp("enrich-ckpt")
    landEvents(src, "batch1")
    val dim = Seq(("click", 1.0), ("view", 0.5), ("signup", 5.0))
      .toDF("event_type", "type_weight")
    IncrementalIngest.enrich(spark, src.toString + "/*", dim, out, ckpt)
      .awaitTermination()
    val got = spark.read.parquet(out)
    val want = Tables.events(spark, sf).join(dim, Seq("event_type"), "left")
    // same rows (unknown types kept with null weight), nothing duplicated
    assert(got.count() == Tables.events(spark, sf).count())
    assert(got.selectExpr("event_id", "event_type", "type_weight")
      .exceptAll(want.selectExpr("event_id", "event_type", "type_weight"))
      .isEmpty)
    assert(got.filter($"type_weight".isNull && $"event_type".isin("click", "view", "signup"))
      .isEmpty, "known types must enrich")
  }

  test("stream-stream interval join matches the equivalent batch join") {
    val src = Files.createTempDirectory("stream-src3")
    val out = tmp("stream-out3")
    val ckpt = tmp("stream-ckpt3")
    landEvents(src, "batch1")

    IncrementalIngest.streamAttribution(spark, src.toString + "/*", out, ckpt)
      .awaitTermination()

    val streamed = spark.read.parquet(out)
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter($"event_type" === "click")
      .select($"user_id".as("c_user"), $"ts".as("click_ts"),
        $"event_id".as("click_id"))
    val batch = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"), $"event_id".as("purchase_id"))
      .join(clicks, $"c_user" === $"user_id" &&
        $"click_ts" <= $"purchase_ts" &&
        $"click_ts" >= $"purchase_ts" - expr("INTERVAL 1 HOUR"))
      .select($"purchase_id", $"user_id", $"purchase_ts", $"click_id", $"click_ts")
    // inner time-bounded join: every pair is emitted once the watermark
    // closes it; AvailableNow over a single finite batch closes everything
    assert(streamed.count() > 0)
    assert(streamed.count() == batch.count())
    assert(streamed.except(batch).count() == 0 &&
      batch.except(streamed).count() == 0)
  }

  test("windowed counts match the equivalent batch rollup for closed windows") {
    val src = Files.createTempDirectory("stream-src2")
    val out = tmp("stream-out")
    val ckpt = tmp("stream-ckpt2")
    landEvents(src, "batch1")

    IncrementalIngest.windowedCounts(spark, src.toString + "/*", out, ckpt)
      .awaitTermination()

    val streamed = spark.read.parquet(out)
    val batch = Tables.events(spark, sf)
      .groupBy(window($"ts", "1 hour").as("w"), $"event_type")
      .agg(count(lit(1)).as("n"), sum($"value").as("total_value"))
      .select($"w.start".as("window_start"), $"w.end".as("window_end"),
        $"event_type", $"n", $"total_value")
    // append mode only emits windows the watermark has passed — every
    // streamed row must equal its batch twin, and cover all but the last
    // watermark-held day
    val joined = streamed.as("s").join(batch.as("b"),
      Seq("window_start", "window_end", "event_type"))
    assert(joined.filter(col("s.n") =!= col("b.n")).count() == 0)
    assert(streamed.count() == joined.count(), "no streamed window missing from batch")
    assert(streamed.count() > 0, "watermark passed at least the early windows")
  }

  test("streaming progress metrics: input rows and state visible (observability)") {
    val src = Files.createTempDirectory("stream-src3")
    val out = tmp("stream-out3")
    val ckpt = tmp("stream-ckpt3")
    landEvents(src, "batch1")
    val q = IncrementalIngest.windowedCounts(spark, src.toString + "/*", out, ckpt)
    q.awaitTermination()
    // the batch QueryMetrics analog for streams: every micro-batch reports
    // row/state volumes a pipeline can alert on
    val progs = q.recentProgress
    assert(progs.nonEmpty, "AvailableNow run must record progress")
    assert(progs.map(_.numInputRows).sum == Tables.events(spark, sf).count(),
      "input-row accounting must cover the whole feed")
    assert(progs.exists(p => p.stateOperators.nonEmpty
        && p.stateOperators.exists(_.numRowsTotal > 0)),
      "the windowed aggregate must expose its state-store volume")
  }
}
