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
  *  3. **Publish** by renaming to `v<N>` and then creating the version's
  *     `_PUBLISHED` marker — ONE atomic file create is the commit point.
  *
  * Readers resolve the highest version whose marker exists, so there is no
  * pointer file to tear: a crash before the marker leaves an invisible
  * directory (re-stageable), a crash after it is a completed publish.
  * (A delete-then-rename pointer swap — the first draft — has a window
  * where no pointer exists and a concurrent reader sees an empty table.)
  * Failed audits leave the staged directory for debugging and publish
  * nothing. Old versions remain readable until vacuumed —
  * `readVersion(dir, n)` is time travel.
  */
object Publish {

  private val Marker = "_PUBLISHED"
  private val VersionName = "v([0-9]+)".r

  private def fs(spark: SparkSession, dir: String) =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** (version, published?) for every vN directory — unmarked directories
    * (a crash between rename and marker) are invisible to readers but MUST
    * still occupy their version number, or a retry would rename fresh data
    * onto the stale crashed directory.
    */
  private def versions(spark: SparkSession, dir: String): Seq[(Int, Boolean)] = {
    val f = fs(spark, dir)
    val root = new Path(dir)
    if (!f.exists(root)) Seq.empty
    else f.listStatus(root).toSeq.flatMap { s =>
      s.getPath.getName match {
        case VersionName(n) if s.isDirectory =>
          Some((n.toInt, f.exists(new Path(s.getPath, Marker))))
        case _ => None
      }
    }.sortBy(_._1)
  }

  /** Version currently visible to readers; 0 = never published. Falls back
    * to a legacy `_current` pointer file (the first draft's protocol) so
    * pre-marker tables stay readable.
    */
  def currentVersion(spark: SparkSession, dir: String): Int =
    versions(spark, dir).filter(_._2).lastOption.map(_._1).getOrElse {
      val f = fs(spark, dir)
      val legacy = new Path(dir, "_current")
      if (!f.exists(legacy)) 0
      else {
        val in = f.open(legacy)
        try scala.io.Source.fromInputStream(in).mkString.trim.toInt
        finally in.close()
      }
    }

  /** The live table (the highest published version). */
  def read(spark: SparkSession, dir: String): DataFrame =
    readVersion(spark, dir, currentVersion(spark, dir))

  /** Any retained version — time travel for audits and reproducibility. */
  def readVersion(spark: SparkSession, dir: String, version: Int): DataFrame = {
    require(version >= 1, s"no published version in $dir")
    spark.read.parquet(new Path(dir, s"v$version").toString)
  }

  /** Run the WAP cycle. Returns the published version, or None if an audit
    * rejected the staged data (nothing published, staging left in place
    * under `_staged_v<N>` for inspection).
    */
  def writeAuditPublish(df: DataFrame, dir: String,
      audits: Seq[DataFrame => Boolean]): Option[Int] = {
    val spark = df.sparkSession
    val f = fs(spark, dir)
    // next version clears EVERY existing vN — published or not — so a
    // crash-leftover unmarked directory is never renamed onto (and never
    // resurrected as someone else's data); it just sits vacuumable
    val next = math.max(
      versions(spark, dir).lastOption.map(_._1).getOrElse(0),
      currentVersion(spark, dir)) + 1
    val staged = new Path(dir, s"_staged_v$next")
    df.write.mode("overwrite").parquet(staged.toString)
    val stagedDf = spark.read.parquet(staged.toString)
    if (!audits.forall(a => a(stagedDf))) None
    else {
      val live = new Path(dir, s"v$next")
      if (!f.rename(staged, live))
        sys.error(s"publish rename failed: $staged -> $live")
      // the commit point: one atomic create, no delete-then-rename window
      f.create(new Path(live, Marker), true).close()
      Some(next)
    }
  }
}
