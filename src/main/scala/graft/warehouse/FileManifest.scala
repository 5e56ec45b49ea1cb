package graft.warehouse

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level statistics manifest — Delta/Iceberg-style data skipping,
  * assembled from parquet FOOTERS only.
  *
  * The reference leans on B-tree indexes for selective scans
  * (`/root/reference/sql/01_schema.sql:19-34`); the columnar-lake analog is
  * a manifest of per-file min/max envelopes consulted before the scan, so a
  * selective predicate opens only the files whose envelope intersects it.
  * Spark's reader already does this per row group *inside* each file it
  * opens; the manifest lifts the same pruning to the file LIST, which is
  * what matters when the table is 100k files on object storage — the
  * planner then never even requests the pruned files.
  *
  * `build` reads footers, not data: the file list is parallelized across
  * executors and each task opens only the ~KB parquet footer of its files
  * (metadata I/O, no row decode). Rebuilding the manifest for a 100 TB
  * table therefore costs minutes, and an incremental ingest appends just
  * its new files' rows.
  *
  * Columns are restricted to integral types (the layout keys this engine
  * Z-orders / buckets on); extending to other orderable parquet stats types
  * is mechanical.
  */
object FileManifest {

  /** One manifest row per (file, column): min/max envelope + row count.
    * Long form rather than wide so the schema is column-set independent
    * (the consumer pivots if it wants wide). Row groups without usable
    * stats for a column are skipped; a column with NO stats in a file
    * fails loudly (a silent absence would read as "file prunable"). An
    * empty directory yields an empty manifest, not a crash.
    */
  def build(spark: SparkSession, dir: String, cols: Seq[String]): DataFrame = {
    import spark.implicits._
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val files = fs.listStatus(new Path(dir))
      .filter(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
      .map(_.getPath.toString).toSeq.sorted
    if (files.isEmpty)
      return spark.emptyDataset[(String, String, Long, Long, Long)]
        .toDF("file", "column", "min_value", "max_value", "n_rows")
    val colList = cols
    // the SESSION's Hadoop conf must reach the executor-side footer reads
    // (s3a credentials/endpoints etc. live there; a blank Configuration()
    // only works on a local filesystem). Hadoop Configuration is not
    // serializable — ship its entries and rebuild.
    val confEntries: Seq[(String, String)] = {
      import scala.jdk.CollectionConverters._
      spark.sparkContext.hadoopConfiguration.iterator().asScala
        .map(e => e.getKey -> e.getValue).toSeq
    }
    spark.createDataset(files)
      .repartition(math.min(files.size, 32))
      .flatMap { f =>
        val conf = new Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val reader = ParquetFileReader.open(
          HadoopInputFile.fromPath(new Path(f), conf))
        try {
          val blocks = reader.getFooter.getBlocks
          import scala.jdk.CollectionConverters._
          val nRows = blocks.asScala.map(_.getRowCount).sum
          colList.map { c =>
            // fold row-group stats into one per-file envelope. EVERY row
            // group must carry usable stats: silently skipping a stats-less
            // group would produce an envelope that doesn't cover all rows,
            // and pruning on it would silently drop matches — the one
            // failure mode a skipping index must never have.
            val chunks = blocks.asScala.flatMap(_.getColumns.asScala)
              .filter(_.getPath.toDotString == c).toSeq
            val envelopes = chunks.map(_.getStatistics).map { s =>
              if (s == null || s.isEmpty
                  || s.genericGetMin == null || s.genericGetMax == null)
                sys.error(s"row group without usable stats for '$c' in $f — " +
                  "a partial envelope must not read as prunable")
              val lo = s.genericGetMin match {
                case l: java.lang.Long => l.longValue
                case i: java.lang.Integer => i.longValue
                case o => sys.error(s"non-integral stats for $c: ${o.getClass}")
              }
              (lo, s.genericGetMax.asInstanceOf[Number].longValue)
            }
            if (envelopes.isEmpty)
              sys.error(s"column '$c' absent from $f — " +
                "a missing envelope must not read as prunable")
            (f.split('/').last, c, envelopes.map(_._1).min,
              envelopes.map(_._2).max, nRows)
          }
        } finally reader.close()
      }
      .toDF("file", "column", "min_value", "max_value", "n_rows")
  }

  /** The files a closed-range predicate `lo <= col <= hi` must read: those
    * whose envelope intersects the range. Everything else is skipped without
    * being opened.
    */
  def filesForRange(manifest: DataFrame, column: String,
      lo: Long, hi: Long): Seq[String] = {
    import manifest.sparkSession.implicits._
    manifest.filter($"column" === column &&
        !($"max_value" < lo || $"min_value" > hi))
      .select($"file").as[String].collect().toSeq.sorted
  }
}
