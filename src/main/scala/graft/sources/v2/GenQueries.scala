package graft.sources.v2

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Registered queries over the [[GenSource]] DSv2 connector. The source is
  * deterministic integer arithmetic, so DuckDB regenerates the identical
  * table from `range(n)` — the oracle checks the whole connector stack
  * (planning, pushdown, partition readers) end-to-end, not just the query.
  */
object GenQueries {

  /** ONE definition of the scan shape, interpolated into the oracle. */
  val Rows = 1000000L
  val RangeLo = 250000L
  val RangeHi = 750000L

  /** Range-restricted aggregate: the id predicates push into the source
    * (bounds consumed exactly — no residual Filter node), the projection
    * prunes the string column, and the tightened range plans fewer input
    * partitions. The query does not touch sfDir: the source IS the data.
    */
  def genPushdown(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("graft-gen")
      .option("rows", Rows).option("slices", 32).load()
      .filter($"id" >= RangeLo && $"id" < RangeHi)
      .groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("sum_v"))
      .orderBy($"k")
  }

  /** Segment rollup over the full range — exercises the string column
    * generator and a second grouping shape.
    */
  def genSegments(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    spark.read.format("graft-gen")
      .option("rows", Rows).option("slices", 32).load()
      .groupBy($"seg")
      .agg(count(lit(1)).as("n"), min($"v").as("min_v"), max($"v").as("max_v"))
      .orderBy($"seg")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "src_gen_pushdown" -> (genPushdown _),
    "src_gen_segments" -> (genSegments _))

  import GenSource._
  private val genSql =
    s"""(SELECT range AS id, range % $KMod AS k,
       (range * $LehmerA) % $LehmerM AS v,
       's' || (range % $SegMod)::VARCHAR AS seg
FROM range($Rows))"""

  val oracle: Map[String, String] = Map(
    "src_gen_pushdown" -> s"""SELECT k, count(*)::BIGINT AS n,
       sum(v)::BIGINT AS sum_v
FROM $genSql g
WHERE id >= $RangeLo AND id < $RangeHi
GROUP BY k ORDER BY k""",

    "src_gen_segments" -> s"""SELECT seg, count(*)::BIGINT AS n,
       min(v)::BIGINT AS min_v, max(v)::BIGINT AS max_v
FROM $genSql g
GROUP BY seg ORDER BY seg""")
}
