package graft.warehouse

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Write-audit-publish — transactional table commits on a plain filesystem.
  *
  * The reference gets atomic loads for free from PostgreSQL transactions
  * (`etl_pipeline.py` commits per batch); a parquet lake has no
  * transactions, so a failed or half-audited write must never be visible to
  * readers. The WAP protocol (the core of Iceberg/Delta commits, usable
  * without either):
  *
  *  1. **Write** the new table version to an unpublished staging directory
  *     (`_staged_v<N>`) — arbitrarily large distributed write, crash-safe
  *     because nothing references it;
  *  2. **Audit** the staged data with caller-supplied checks (row counts,
  *     DQ predicates) — reading the staged directory, not the live table;
  *  3. **Publish** by renaming to `v<N>` and atomically swapping the
  *     `_current` pointer file (one small-file overwrite — the only step
  *     readers can observe, and it's all-or-nothing).
  *
  * Failed audits leave the staged directory for debugging and the pointer
  * untouched: readers never see a bad version. Old versions remain
  * readable until vacuumed — `readVersion(dir, n)` is time travel.
  */
object Publish {

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def pointer(dir: String) = new Path(dir, "_current")

  /** Version currently visible to readers; 0 = never published. */
  def currentVersion(spark: SparkSession, dir: String): Int = {
    val f = fs(spark, dir)
    val p = pointer(dir)
    if (!f.exists(p)) 0
    else {
      val in = f.open(p)
      try scala.io.Source.fromInputStream(in).mkString.trim.toInt
      finally in.close()
    }
  }

  /** The live table (the version `_current` points at). */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, currentVersion(spark, dir))

  /** Any retained version — time travel for audits and reproducibility. */
  def readVersion(spark: SparkSession, dir: String, version: Int): DataFrame = {
    require(version >= 1, s"no published version in $dir")
    spark.read.parquet(new Path(dir, s"v$version").toString)
  }

  /** Run the WAP cycle. Returns the published version, or None if an audit
    * rejected the staged data (pointer untouched, staging left in place
    * under `_staged_v<N>` for inspection).
    */
  def writeAuditPublish(df: DataFrame, dir: String,
      audits: Seq[DataFrame => Boolean]): Option[Int] = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    val next = currentVersion(spark, dir) + 1
    val staged = new Path(dir, s"_staged_v$next")
    df.write.mode("overwrite").parquet(staged.toString)
    val stagedDf = spark.read.parquet(staged.toString)
    if (!audits.forall(a => a(stagedDf))) None
    else {
      val live = new Path(dir, s"v$next")
      if (!f.rename(staged, live))
        sys.error(s"publish rename failed: $staged -> $live")
      // pointer swap: write-then-rename so readers see old or new, never a
      // torn pointer
      val tmp = new Path(dir, s"_current.tmp$next")
      val out = f.create(tmp, true)
      try out.write(next.toString.getBytes("UTF-8")) finally out.close()
      if (f.exists(pointer(dir))) f.delete(pointer(dir), false)
      if (!f.rename(tmp, pointer(dir)))
        sys.error(s"pointer swap failed for v$next")
      Some(next)
    }
  }
}
