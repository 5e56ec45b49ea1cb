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
}
