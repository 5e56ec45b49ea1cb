package graft.warehouse

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bucketed-table ingest — the shuffle-elimination layout the warehouse
  * scale notes promise ("at 1000 executors both sides would be bucketed by
  * order key at ingest time so this join is co-located",
  * [[Warehouse.build]]).
  *
  * Writing both sides of a recurring big-big join bucketed (and sorted) on
  * the join key means every later join/aggregation on that key runs with NO
  * exchange: each task reads bucket i of both tables and merges. At 100 TB
  * this converts the fact-build's largest shuffle (orders ⋈ lineitem, both
  * huge) into a scan-side property paid once at ingest — the Spark-native
  * equivalent of the reference's clustered B-tree primary keys.
  *
  * Buckets are session-catalog parquet tables (`bucketBy` requires
  * `saveAsTable`; works with the in-memory catalog — no Hive metastore
  * needed). Bucket count is the parallelism knob: at scale, pick
  * ~(table size / target partition size), keep it equal on both sides.
  *
  * PlanSpec-style assertion lives in ScaleVariantsSpec: the bucketed join
  * plan contains zero ShuffleExchange operators and returns rows identical
  * to the plain (shuffling) join.
  */
object Bucketing {

  /** Land `df` as a bucketed + in-bucket-sorted catalog table. Idempotent
    * across JVMs: the in-memory catalog forgets tables between sessions
    * while their managed locations survive, so any stale location is cleared
    * first (CREATE refuses to reuse one).
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS `$table`")
    val loc = new org.apache.hadoop.fs.Path(
      spark.sessionState.conf.warehousePath, table.toLowerCase)
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
    df.write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)
  }

  /** Small-files compaction: rewrite a parquet directory into
    * size-targeted files. Streaming ingest appends one file set per
    * micro-batch — at 100 TB that accretes into millions of small files,
    * and scan cost becomes dominated by per-file open/footer overhead and
    * tiny row groups rather than bytes. Compaction is the periodic
    * maintenance job that restores the layout: count once, rewrite into
    * ceil(n / targetRowsPerFile) even files. The rewrite is a round-robin
    * repartition (no key, no sort — pure file-count control, the cheapest
    * shuffle) into an overwrite of a NEW directory so a failed compaction
    * never corrupts the live one; callers swap directories on success.
    */
  def compact(spark: SparkSession, srcDir: String, outDir: String,
      targetRowsPerFile: Long = 1000000L): Long = {
    val df = spark.read.parquet(srcDir)
    val n = df.count()
    val files = math.max(1L, (n + targetRowsPerFile - 1) / targetRowsPerFile)
    df.repartition(files.toInt).write.mode("overwrite").parquet(outDir)
    files
  }

  /** The fact-build join shape over pre-bucketed sides: orders ⋈ per-order
    * lineitem rollup, joined on the bucket key with no exchange.
    */
  def coLocatedOrderJoin(spark: SparkSession, ordersTable: String,
      lineitemTable: String): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val counts = spark.table(lineitemTable)
      .groupBy($"l_orderkey")
      .agg(count(lit(1)).as("num_procedures"),
        sum($"l_quantity").as("total_quantity"))
    spark.table(ordersTable)
      .join(counts, $"o_orderkey" === $"l_orderkey")
      .select($"o_orderkey", $"o_custkey", $"o_totalprice",
        $"num_procedures", $"total_quantity")
  }
}
