package graft

import graft.streaming.StreamNearDedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Streaming MinHash-LSH near-dedup: the stateful bucket-claim stream must
  * equal the batch first-claim semantics, persist claims across RUNS via
  * the checkpoint, and actually kill planted near-dup mirrors.
  */
class StreamNearDedupSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(p: String): String = Files.createTempDirectory(p).toString

  /** Batch twin of the stream's greedy first-claim dedup, derived with a
    * window over the SAME banded buckets the batch family computes.
    */
  private def batchLedger(feed: DataFrame): Seq[(String, Long, Long, Long)] = {
    val withSh = dedup.Dedup.withShingles(feed).filter(size($"sh") > 0)
    val sigs = dedup.MinHashLsh.signatures(withSh.select($"doc_id", $"sh"))
    val banded = sigs.select($"doc_id", explode(expr(
      s"""transform(sequence(0, ${dedup.MinHashLsh.Bands - 1}),
         |  b -> struct(CAST(b AS INT) AS band,
         |              md5(concat_ws(',',
         |                transform(slice(sig, b * ${dedup.MinHashLsh.RowsPerBand} + 1,
         |                                ${dedup.MinHashLsh.RowsPerBand}),
         |                          v -> cast(v AS STRING)))) AS bucket))
         |""".stripMargin)).as("bb"))
      .select($"doc_id", $"bb.band", $"bb.bucket")
    val fresh = banded.withColumn("fresh",
      row_number().over(Window.partitionBy($"band", $"bucket")
        .orderBy($"doc_id")) === 1)
    fresh.groupBy($"doc_id")
      .agg(min(when($"fresh", 1).otherwise(0)).as("keep"))
      .join(feed.select($"doc_id", $"lang"), "doc_id")
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"keep").cast("bigint").as("n_kept"),
        (count(lit(1)) - sum($"keep")).cast("bigint").as("n_dropped"))
      .orderBy($"lang")
      .as[(String, Long, Long, Long)].collect().toSeq
  }

  test("one-shot stream ledger equals the batch first-claim ledger") {
    val streamed = StreamNearDedup.all("stream_near_dedup")(spark, sf)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(streamed == batchLedger(StreamNearDedup.feed(spark, sf)))
  }

  test("planted mirrors are overwhelmingly dropped (any-band collision)") {
    val ledger = StreamNearDedup.all("stream_near_dedup")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    val mirrors = Tables.documents(spark, sf)
      .filter(pmod($"doc_id", lit(StreamNearDedup.MirrorModulo)) === 0).count()
    val dropped = ledger.map(_._4).sum
    assert(dropped >= (mirrors * 8) / 10,
      s"only $dropped dropped of $mirrors planted mirrors — LSH claims not firing")
  }

  test("claims persist across RUNS: a bucket claimed in run 1 kills run 2's mirror") {
    val src = Files.createTempDirectory("neardedup-src")
    val (out, ckpt) = (tmp("neardedup-out"), tmp("neardedup-ckpt"))
    val docs = Tables.documents(spark, sf).select($"doc_id", $"text", $"lang")
    // run 1: originals only
    docs.write.mode("overwrite").parquet(src.resolve("originals").toString)
    streaming.IncrementalIngest.withStreamPartitions(spark) { ss =>
      StreamNearDedup.nearDedup(ss, src.toString + "/*", out, ckpt)
        .awaitTermination()
    }
    // run 2: the mirrors arrive later, as a separate catch-up run
    docs.filter(pmod($"doc_id", lit(StreamNearDedup.MirrorModulo)) === 0)
      .withColumn("doc_id", $"doc_id" + lit(StreamNearDedup.MirrorIdOffset))
      .withColumn("text", concat($"text", lit(StreamNearDedup.MirrorSuffix)))
      .write.mode("overwrite").parquet(src.resolve("mirrors").toString)
    streaming.IncrementalIngest.withStreamPartitions(spark) { ss =>
      StreamNearDedup.nearDedup(ss, src.toString + "/*", out, ckpt)
        .awaitTermination()
    }
    val twoRun = spark.read.parquet(out)
      .groupBy($"doc_id", $"lang")
      .agg(min(when($"fresh", 1).otherwise(0)).as("keep"))
      .groupBy($"lang")
      .agg(count(lit(1)).as("n_docs"), sum($"keep").cast("bigint").as("n_kept"),
        (count(lit(1)) - sum($"keep")).cast("bigint").as("n_dropped"))
      .orderBy($"lang")
      .as[(String, Long, Long, Long)].collect().toSeq
    // mirror ids all exceed original ids, so batch order == doc_id order and
    // the two-run ledger must equal the single-batch one
    assert(twoRun == batchLedger(StreamNearDedup.feed(spark, sf)),
      "checkpointed bucket claims must carry across runs")
  }
}
