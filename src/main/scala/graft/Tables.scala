package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Raw driver-supplied parquet tables (`TESTDATA.md` / `FIXTURES.md` §B).
  *
  * These are the engine's *sources*: one columnar parquet table per entity.
  * The reference lands data in PostgreSQL heap tables
  * (`/root/reference/sql/01_schema.sql`); here the storage layer is parquet +
  * Spark's vectorized reader, so column pruning and predicate pushdown reach
  * the scan for free — the 16 B-tree indexes of the reference
  * (`sql/01_schema.sql:19` etc.) map to parquet min/max pruning instead.
  *
  * At 100 TB each of these would be a partitioned directory
  * (e.g. `orders/` partitioned by month of `o_orderdate`) rather than a single
  * file; the loaders take a directory root so that swap is a path change.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  private def rd(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def region(spark: SparkSession, dir: String): DataFrame   = rd(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame   = rd(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame     = rd(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame   = rd(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "lineitem")
  /** `events.parquet` has carried two physical `ts` encodings across driver
    * testdata generations: TIMESTAMP(NANOS) (which Spark's reader rejects by
    * default while DuckDB silently truncates to micros) and plain
    * TIMESTAMP(MICROS) (isAdjustedToUTC=false → TIMESTAMP_NTZ in Spark).
    * Adapt to whichever the file declares: nanos are read as long and
    * truncated toward zero to micros (matching DuckDB's ns→us cast); micros
    * (TIMESTAMP_NTZ) are cast to the session-zoned TIMESTAMP every
    * downstream query expects (identity under the pinned UTC session
    * timezone). Any OTHER physical type is a new, unvetted testdata
    * generation — fail loudly rather than null-cast into silently empty
    * `ts IS NOT NULL` results.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = rd(spark, dir, "events")
    import org.apache.spark.sql.functions.{col, expr}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case TimestampType => df
      case other => throw new IllegalStateException(
        s"events.ts has unexpected physical type $other — " +
          "extend Tables.events for this testdata generation")
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame  = rd(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = rd(spark, dir, "embeddings")

  /** Spread a kernel-dense map stage over the cluster WHEN the scan
    * feeding it cannot: parquet splits only at row-group boundaries, so a
    * table written as one small file (every sf0.x fixture; any dimension-
    * sized landing) scans as ONE task no matter how many cores exist —
    * and a map-heavy pipeline riding that scan (per-row md5 replication,
    * shingling, codec work) serializes on one core while the rest idle.
    *
    * The exchange is added ONLY when the scan is provably narrow: total
    * input bytes under `defaultParallelism × maxPartitionBytes` would
    * yield fewer splits than cores, and a [[NarrowScanCapBytes]] hard cap
    * keeps the rule from ever shuffling a big table (at 100 TB the scan
    * has thousands of row groups and natural parallelism — an exchange
    * there would be pure waste, so the condition derives from INPUT SIZE,
    * not from a local-mode constant). Round-robin keeps row contents
    * intact; callers must be partitioning-insensitive (aggregates /
    * totally-ordered outputs — the repo norm).
    */
  def spreadNarrowScan(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    val p = spark.sparkContext.defaultParallelism
    val rels = df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.sizeInBytes
          case _ => Long.MaxValue // non-file relation: unknown, don't touch
        }
    }
    val bytes = if (rels.isEmpty) Long.MaxValue else rels.sum
    val maxSplit = org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      spark.conf.get("spark.sql.files.maxPartitionBytes", "128m"))
    if (bytes <= NarrowScanCapBytes && bytes < p.toLong * maxSplit)
      df.repartition(p)
    else df
  }

  /** Never spread a scan above this size (1 GiB): past it the table has
    * enough row groups to parallelize on its own and the exchange is
    * waste.
    */
  val NarrowScanCapBytes: Long = 1L << 30
}
