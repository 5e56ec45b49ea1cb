package graft

import graft.sources.Sources
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Source/sample/sink semantics: deterministic sampling, synthetic source
  * shape, assignment-join stability, and S5 sink roundtrips (csv/json/
  * partitioned parquet — the reference's JDBC row sink becomes format
  * writes; partitioned parquet is the scale sink).
  */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("seeded sample is deterministic and ~1/8 of the feed") {
    val n = Tables.events(spark, sf).count()
    val s1 = Sources.seededSample(spark, sf).collect().map(_.getLong(0))
    val s2 = Sources.seededSample(spark, sf).collect().map(_.getLong(0))
    assert(s1.sameElements(s2))
    assert(s1.length > n / 16 && s1.length < n / 4, s"${s1.length} of $n")
  }

  test("stratified sample: exactly min(N, stratum size) per source, stable") {
    import graft.sources.Sources
    val s = Sources.stratifiedSample(spark, sf)
    val perSource = s.groupBy($"source").count()
    val sizes = Tables.documents(spark, sf).groupBy($"source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    perSource.collect().foreach { r =>
      val want = math.min(Sources.StratumN.toLong, sizes(r.getString(0)))
      assert(r.getLong(1) == want, s"stratum ${r.getString(0)}")
    }
    // membership is a pure function of the id — two runs agree exactly
    val again = Sources.stratifiedSample(spark, sf)
    assert(s.exceptAll(again).count() == 0 && again.exceptAll(s).count() == 0)
  }

  test("synthetic source: schema, cardinality, domains") {
    val df = Sources.syntheticEvents(spark, 1000)
    assert(df.columns.toSeq == Seq("event_id", "ts", "user_id", "event_type", "value"))
    assert(df.count() == 1000)
    assert(df.filter($"event_type".isin(graft.ingest.Ingest.EventTypes: _*))
      .count() == 1000)
    assert(df.agg(countDistinct($"user_id")).head().getLong(0) == 97)
  }

  test("assignment join is stable and total on matched buckets") {
    val a1 = Sources.assignmentJoin(spark, sf).collect()
    val a2 = Sources.assignmentJoin(spark, sf).collect()
    assert(a1.map(_.toString).sameElements(a2.map(_.toString)))
    // every event maps to at most one pool member
    assert(a1.map(_.getLong(0)).distinct.length == a1.length)
  }

  test("word frequency conserves the token count") {
    val totalWords = Sources.wordFrequency(spark, sf)
      .agg(sum($"n")).head().getLong(0)
    val tokenTotal = Tables.documents(spark, sf)
      .select(size(split(trim(lower($"text")), "\\s+")).as("k"))
      .agg(sum($"k")).head().getLong(0)
    assert(totalWords == tokenTotal)
  }

  test("S4 volume generator: hierarchy bounds, distinct diagnoses, determinism") {
    val enc = Sources.volumeEncounters(spark, sf)
    val rows = enc.collect()
    // patient grain: 1-8 encounters each, every patient present
    val perPatient = enc.groupBy($"patient_id").count().collect()
    assert(perPatient.length == Sources.VolumePatients)
    assert(perPatient.forall(r => r.getLong(1) >= 1 && r.getLong(1) <= 8))
    // reference domains: age 18-90, 2-year date window, distinct sample(2)
    assert(rows.forall { r =>
      val age = r.getAs[Long]("age"); age >= 18 && age <= 90
    })
    assert(rows.forall { r =>
      val sec = r.getAs[String]("secondary_code")
      sec == null || sec != r.getAs[String]("primary_code")
    })
    // procedures: fan-out matches the encounter's declared count
    val procs = Sources.volumeProcedures(spark, sf)
      .groupBy($"encounter_id").count()
    val joined = enc.select($"encounter_id", $"num_procedures")
      .join(procs, "encounter_id")
    assert(joined.count() == rows.length)
    assert(joined.filter($"num_procedures" =!= $"count").count() == 0)
    // retry-safety: regeneration is bit-identical
    val again = Sources.volumeEncounters(spark, sf).collect()
    assert(rows.map(_.toString).sameElements(again.map(_.toString)))
  }

  test("compaction: fewer files, identical rows, target respected") {
    import graft.warehouse.Bucketing
    val base = Files.createTempDirectory("compact").toString
    val events = Tables.events(spark, sf)
    // simulate micro-batch accretion: 64 tiny files
    events.repartition(64).write.mode("overwrite").parquet(s"$base/small")
    val nSmall = new java.io.File(s"$base/small").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nSmall == 64)
    Bucketing.compact(spark, s"$base/small", s"$base/big",
      targetRowsPerFile = events.count() / 4 + 1)
    val nBig = new java.io.File(s"$base/big").listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(nBig <= 4 && nBig >= 1, s"expected <=4 files, saw $nBig")
    val back = spark.read.parquet(s"$base/big")
    assert(back.count() == events.count())
    assert(back.except(events).count() == 0 && events.except(back).count() == 0)
  }

  test("partitioned compaction: per-partition file bounds, layout kept") {
    import graft.warehouse.Bucketing
    val base = Files.createTempDirectory("compactp").toString
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"value")
    // micro-batch accretion into a hive-partitioned root: many files/dir
    events.repartition(16)
      .write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$base/small")
    val total = events.count()
    val ledger = Bucketing.compactPartitioned(spark, s"$base/small",
      s"$base/big", "event_type", "event_id",
      targetRowsPerFile = total / 10 + 1)
      .collect().map(r => r.getString(0) -> r.getInt(2)).toMap
    assert(ledger.nonEmpty)
    // every partition dir survives with no more files than its size bound
    for ((etype, bound) <- ledger) {
      val dir = new java.io.File(s"$base/big/event_type=$etype")
      assert(dir.isDirectory, s"partition dir missing for $etype")
      val n = dir.listFiles().count(_.getName.endsWith(".parquet"))
      assert(n >= 1 && n <= bound, s"$etype: $n files, bound $bound")
    }
    val back = spark.read.parquet(s"$base/big")
      .select($"event_id", $"user_id", $"event_type", $"value")
    assert(back.count() == total)
    assert(back.except(events).count() == 0 && events.except(back).count() == 0)
  }

  test("jsonl corrupt-record handling: bad lines quarantined, good survive") {
    val base = Files.createTempDirectory("jsonlbad").toString
    // a feed with malformed lines interleaved — the real-crawl JSONL shape
    val lines = Seq(
      """{"doc_id": 1, "text": "alpha", "n_chars": 5}""",
      """{"doc_id": 2, "text": "beta", """, // truncated JSON
      """not json at all""",
      """{"doc_id": 3, "text": "gamma", "n_chars": 5}""")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$base/feed.jsonl"),
      String.join("\n", lines: _*).getBytes)
    val schema = org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, text STRING, n_chars BIGINT, _corrupt_record STRING")
    val read = spark.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(s"$base/feed.jsonl")
      .cache() // required by Spark for corrupt-record queries on raw JSON
    val good = read.filter($"_corrupt_record".isNull)
    val bad = read.filter($"_corrupt_record".isNotNull)
    assert(good.count() == 2 && bad.count() == 2)
    assert(good.select($"doc_id").collect().map(_.getLong(0)).sorted
      .sameElements(Array(1L, 3L)))
    // the quarantine keeps the raw line for replay/debugging
    assert(bad.select($"_corrupt_record").collect()
      .forall(r => r.getString(0).nonEmpty))
    read.unpersist()
  }

  test("schema evolution: name-aligned union, defaults back-fill history") {
    val base = Files.createTempDirectory("evolve").toString
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"value")
    // batch 1: the original feed schema; batch 2: a later feed that ADDED
    // a quality column and REORDERED the survivors
    val b1 = events.filter($"event_id" % 2 === 0)
    val b2 = events.filter($"event_id" % 2 === 1)
      .select($"value", $"event_type", $"user_id", $"event_id",
        (($"event_id" % 5) + 1).cast("int").as("quality"))
    b1.write.mode("overwrite").parquet(s"$base/b1")
    b2.write.mode("overwrite").parquet(s"$base/b2")
    // mergeSchema read: one frame, evolved column nullable over history
    val merged = spark.read.option("mergeSchema", "true")
      .parquet(s"$base/b1", s"$base/b2")
    assert(merged.columns.contains("quality"))
    assert(merged.count() == events.count())
    assert(merged.filter($"quality".isNull).count() == b1.count(),
      "history rows must surface the evolved column as null")
    // unionEvolved: same frame with the default back-filled — and the
    // name alignment must have kept every value with its column
    val evolved = sources.Sources.unionEvolved(
      Seq(spark.read.parquet(s"$base/b1"), spark.read.parquet(s"$base/b2")),
      Map("quality" -> lit(0)))
    assert(evolved.filter($"quality".isNull).count() == 0)
    assert(evolved.filter($"quality" === 0).count() == b1.count())
    val back = evolved.select($"event_id", $"user_id", $"event_type", $"value")
    assert(back.except(events).count() == 0 && events.except(back).count() == 0,
      "name-aligned union must not misassign reordered columns")
  }

  test("S5 sinks: csv and json roundtrip; parquet partitioned write prunes") {
    val events = Tables.events(spark, sf)
      .select($"event_id", $"user_id", $"event_type", $"value")
    val base = Files.createTempDirectory("sinks").toString

    events.write.mode("overwrite").option("header", "true").csv(s"$base/csv")
    val csvBack = spark.read.option("header", "true")
      .schema("event_id BIGINT, user_id BIGINT, event_type STRING, value DOUBLE")
      .csv(s"$base/csv")
    assert(csvBack.count() == events.count())

    events.write.mode("overwrite").json(s"$base/json")
    assert(spark.read.json(s"$base/json").count() == events.count())

    // partitioned parquet: the scale sink — a filter on the partition column
    // must prune to one directory (partition pruning, the index analog)
    events.write.mode("overwrite").partitionBy("event_type")
      .parquet(s"$base/part")
    val one = spark.read.parquet(s"$base/part").filter($"event_type" === "click")
    assert(one.count() ==
      events.filter($"event_type" === "click").count())
    val plan = one.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      "partition filter must reach the scan")
  }

  test("CSV quarantine: clean + quarantined = landed, exactly the planted lines") {
    val landed = Tables.events(spark, sf).count()
    // Spark disallows queries touching ONLY the corrupt column
    // (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize the parse once and
    // split locally, exactly the caching the error message prescribes
    val rows = Sources.csvRead(spark, sf).collect()
    val (bad, clean) = rows.partition(_.getAs[String]("_corrupt") != null)
    assert(clean.length + bad.length == landed)
    val expectedBad = Tables.events(spark, sf)
      .filter(pmod($"event_id", lit(Sources.CsvCorruptEvery))
        === Sources.CsvCorruptAt).count()
    assert(bad.length == expectedBad)
    assert(expectedBad > 0, "corruption must actually be planted")
    // every quarantined line is a planted GARBAGE line, raw text preserved
    assert(bad.forall(_.getAs[String]("_corrupt").startsWith("GARBAGE|")))
  }
}
