package graft.streaming

import graft.warehouse.Scd2
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming dimension maintenance: SCD2 merges applied from a CHANGE
  * STREAM via `foreachBatch` — the sink pattern for writes Structured
  * Streaming cannot express declaratively (a versioned merge reads its own
  * previous output). Each micro-batch runs the same merge semantics as the
  * batch [[graft.warehouse.Scd2]] operator: close the current version of
  * keys whose attributes changed, append the successor, insert fresh keys.
  *
  * Exactly-once without transactions, from three independent guards:
  *
  *  - **checkpoint** — each batch is delivered once (plus at most one
  *    replay after a crash);
  *  - **replay no-op merge** — an insert is skipped when the key already
  *    exists, an update is skipped when the current attributes already
  *    equal the incoming ones or the change is not strictly newer than the
  *    current version's valid_from (which also rejects out-of-order late
  *    changes that would invert validity intervals); malformed change rows
  *    (null key or null effective date) are dropped at the door;
  *  - **atomic publication** — each merge writes a complete snapshot
  *    `snap_<batchId>` and readers resolve the LATEST snapshot carrying the
  *    `_SUCCESS` marker (written last by the Hadoop commit protocol). There
  *    is no in-place overwrite of a "current" directory, so no crash window
  *    can lose the dimension: an interrupted write has no marker and is
  *    invisible; the replay rewrites it. Older snapshots are pruned after a
  *    successful publish (idempotent deletes). Filesystem access goes
  *    through the Hadoop FileSystem API, so the same code addresses HDFS/S3
  *    paths, not only local disk.
  *
  * Scale notes (100 TB): the change batch is small by nature and is
  * broadcast into one pass over the dimension snapshot; versions are derived
  * (`current version + 1`), never a sequence. The snapshot scheme stands in
  * for the MERGE INTO of a transactional table format, which is what a
  * production deployment would use — the merge DAG is identical.
  */
object DimMaintain {

  private val changeDdl =
    "patient_id BIGINT, age_group STRING, sex STRING, location STRING, " +
      "effective_date DATE"

  private def dimSchema: StructType = StructType.fromDDL(
    "patient_id BIGINT, age_group STRING, sex STRING, location STRING, " +
      "version INT, valid_from DATE, valid_to DATE, is_current BOOLEAN")

  private def fileSystem(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest COMPLETE snapshot (highest batch id whose directory carries the
    * _SUCCESS marker), if any.
    */
  private def latestSnap(spark: SparkSession, dimDir: String): Option[Path] = {
    val fs = fileSystem(spark, dimDir)
    val root = new Path(dimDir)
    if (!fs.exists(root)) None
    else fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snap_"))
      .filter(s => fs.exists(new Path(s.getPath, "_SUCCESS")))
      .sortBy(_.getPath.getName.stripPrefix("snap_").toLong)
      .lastOption.map(_.getPath)
  }

  /** The versioned dimension as of the last published snapshot (empty frame
    * before the first).
    */
  def dim(spark: SparkSession, dimDir: String): DataFrame =
    latestSnap(spark, dimDir) match {
      case Some(p) => spark.read.parquet(p.toString)
      case None => spark.createDataFrame(
        spark.sparkContext.emptyRDD[Row], dimSchema)
    }

  /** One SCD2 merge of a change batch into the dimension snapshot.
    * Deterministic: duplicate keys within a batch collapse to the
    * lexicographically-greatest (effective_date, attrs) tuple; closes and
    * inserts derive purely from (current row, incoming row).
    */
  def mergeBatch(spark: SparkSession, batch0: DataFrame, dimDir: String,
      batchId: Long): Unit = {
    import spark.implicits._
    if (batch0.isEmpty) return
    // crash-replay short-circuit: if this batch's snapshot is already the
    // published latest, the merge already happened — recomputing would also
    // mean overwriting the very snapshot being read. Only the retention
    // pass (below) may still be owed.
    val alreadyPublished =
      latestSnap(spark, dimDir).exists(_.getName == s"snap_$batchId")
    if (!alreadyPublished) mergeInto(spark, batch0, dimDir, batchId)
    val fsRet = fileSystem(spark, dimDir)
    fsRet.listStatus(new Path(dimDir)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("snap_"))
      .filter(_.getPath.getName.stripPrefix("snap_").toLong < batchId)
      .foreach(s => fsRet.delete(s.getPath, true))
  }

  private def mergeInto(spark: SparkSession, batch0: DataFrame,
      dimDir: String, batchId: Long): Unit = {
    import spark.implicits._
    val batch = batch0
      // malformed changes (no key / no effective date) never reach the merge
      .filter($"patient_id".isNotNull && $"effective_date".isNotNull)
      .groupBy($"patient_id")
      .agg(max(struct($"effective_date", $"age_group", $"sex", $"location"))
        .as("c"))
      .select($"patient_id", $"c.age_group", $"c.sex", $"c.location",
        $"c.effective_date")
    val cur = dim(spark, dimDir)
    val current = cur.filter($"is_current").select($"patient_id",
      $"age_group".as("c_ag"), $"sex".as("c_sex"), $"location".as("c_loc"),
      $"version".as("c_ver"), $"valid_from".as("c_from"))
    val b = batch.join(current, Seq("patient_id"), "left")
    val inserts = b.filter($"c_ver".isNull)
      .select($"patient_id", $"age_group", $"sex", $"location",
        lit(1).as("version"), $"effective_date".as("valid_from"),
        lit(Scd2.OpenEnd).cast("date").as("valid_to"),
        lit(true).as("is_current"))
    // only REAL attribute changes that are STRICTLY NEWER than the current
    // version take effect: equal attrs = replay no-op; effective_date ≤
    // current valid_from = out-of-order late change, rejected rather than
    // closing a row with an inverted validity interval
    val changed = b.filter($"c_ver".isNotNull &&
      $"effective_date" > $"c_from" &&
      (!($"age_group" <=> $"c_ag") || !($"sex" <=> $"c_sex")
        || !($"location" <=> $"c_loc")))
    val newVers = changed
      .select($"patient_id", $"age_group", $"sex", $"location",
        ($"c_ver" + 1).cast("int").as("version"),
        $"effective_date".as("valid_from"),
        lit(Scd2.OpenEnd).cast("date").as("valid_to"),
        lit(true).as("is_current"))
    val closing = changed.select($"patient_id", $"effective_date".as("eff"))
    val updated = cur.join(broadcast(closing), Seq("patient_id"), "left")
      .select($"patient_id", $"age_group", $"sex", $"location", $"version",
        $"valid_from",
        when($"is_current" && $"eff".isNotNull, $"eff").otherwise($"valid_to")
          .as("valid_to"),
        ($"is_current" && $"eff".isNull).as("is_current"))
    val out = updated.unionByName(inserts).unionByName(newVers)
    // atomic publication: the _SUCCESS marker (committed last) makes the
    // snapshot visible; readers never see a partial write
    out.write.mode("overwrite").parquet(s"$dimDir/snap_$batchId")
  }

  /** Watch `srcDir` for change-record parquet files and keep the versioned
    * dimension under `dimDir` current. AvailableNow catch-up trigger, like
    * the other streaming entries.
    */
  def maintain(spark: SparkSession, srcDir: String, dimDir: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream
      .schema(StructType.fromDDL(changeDdl))
      .parquet(srcDir)
      .writeStream
      .foreachBatch((b: DataFrame, id: Long) =>
        mergeBatch(b.sparkSession, b, dimDir, id))
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .start()
}
