package graft

import graft.streaming.TransformWithState
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** The transformWithState running ledger: checkpointed ValueState/MapState
  * must CONTINUE across separate runs — a two-run split of the feed must
  * produce the same ledger as the one-shot entry (seq_no keeps counting,
  * cum_v keeps summing, per-type MapState counters keep incrementing).
  */
class TransformWithStateSpec extends SparkSpec {
  import spark.implicits._

  test("ledger state continues across runs, equals the batch window twin") {
    val src = Files.createTempDirectory("tws-src")
    val out = Files.createTempDirectory("tws-out").toString
    val ckpt = Files.createTempDirectory("tws-ckpt").toString
    val feed = Tables.events(spark, sf)
      .filter($"user_id".isNotNull)
      .select($"event_id", $"user_id",
        coalesce($"event_type", lit("(null)")).as("event_type"),
        floor($"value").cast("long").as("v"))
    val cut = feed.select(expr("percentile(event_id, 0.5)")).head.getDouble(0)
    // run 1: first half of the event history
    feed.filter($"event_id" <= cut)
      .write.mode("overwrite").parquet(src.resolve("h1").toString)
    streaming.IncrementalIngest.withStreamPartitions(spark) { ss =>
      TransformWithState.runningLedger(ss, src.toString + "/*", out, ckpt)
        .awaitTermination()
    }
    // run 2: the rest arrives later (all ids above run 1's — within-batch
    // event_id ordering therefore equals global ordering)
    feed.filter($"event_id" > cut)
      .write.mode("overwrite").parquet(src.resolve("h2").toString)
    streaming.IncrementalIngest.withStreamPartitions(spark) { ss =>
      TransformWithState.runningLedger(ss, src.toString + "/*", out, ckpt)
        .awaitTermination()
    }
    val twoRun = spark.read.parquet(out)
      .select($"event_id", $"user_id", $"seq_no", $"cum_v", $"type_seen")
    // the batch window twin over the whole feed
    import org.apache.spark.sql.expressions.Window
    val wU = Window.partitionBy($"user_id").orderBy($"event_id")
    val wUT = Window.partitionBy($"user_id", $"event_type").orderBy($"event_id")
    val expected = feed
      .withColumn("seq_no", row_number().over(wU).cast("long"))
      .withColumn("cum_v", sum($"v").over(
        wU.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("type_seen", row_number().over(wUT).cast("long"))
      .select($"event_id", $"user_id", $"seq_no", $"cum_v", $"type_seen")
    assert(twoRun.count() === expected.count())
    assert(twoRun.exceptAll(expected).isEmpty &&
        expected.exceptAll(twoRun).isEmpty,
      "checkpointed ValueState + MapState must continue counting across runs")
  }
}
