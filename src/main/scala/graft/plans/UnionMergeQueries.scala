package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing proof queries for [[MergeUnionAggregates]].
  *
  * The query is the HAND-WRITTEN multi-grain report (the reference's SQL
  * stacks per-grain SELECTs the same way; `sql/analytics_queries.sql`):
  * three aggregates over the same raw `orders` scan, stacked with UNION
  * ALL — (yr, mo), (yr), and (mo) grains, the missing key padded with a
  * NULL literal per branch. The DuckDB oracle runs the identical
  * three-branch UNION ALL against the raw table, so the hash match proves
  * the merged grouping-sets plan changed the PLAN and nothing else
  * (UnionMergeSpec gates the plan itself: one parquet scan, one Expand).
  *
  * Money math rides DECIMAL(14,2) with one DOUBLE cast at the edge (the
  * [[graft.analytics.GroupingSets]] discipline), and the final sort pins
  * NULLS FIRST explicitly on both engines — the padded grain keys are
  * exactly where Spark's and DuckDB's default null order disagree.
  */
object UnionMergeQueries {

  /** One branch: `orders` at the given grain, with absent grain keys
    * padded as typed NULL literals so the three branches are
    * union-compatible.
    */
  private def branch(spark: SparkSession, dir: String,
      byYr: Boolean, byMo: Boolean): DataFrame = {
    import spark.implicits._
    val keyed = Tables.orders(spark, dir)
      .select(year($"o_orderdate").cast("int").as("yr"),
        month($"o_orderdate").cast("int").as("mo"),
        expr("CAST(o_totalprice AS DECIMAL(14,2))").as("price"))
    val keys = (if (byYr) Seq($"yr") else Nil) ++ (if (byMo) Seq($"mo") else Nil)
    keyed.groupBy(keys: _*)
      .agg(count(lit(1)).as("n_orders"),
        expr("CAST(sum(price) AS DOUBLE)").as("total_price"))
      .select(
        (if (byYr) $"yr" else lit(null).cast("int").as("yr")),
        (if (byMo) $"mo" else lit(null).cast("int").as("mo")),
        $"n_orders", $"total_price")
  }

  private def unionRollup(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    branch(spark, dir, byYr = true, byMo = true)
      .union(branch(spark, dir, byYr = true, byMo = false))
      .union(branch(spark, dir, byYr = false, byMo = true))
      .orderBy($"yr".asc_nulls_first, $"mo".asc_nulls_first)
  }

  /** The merged plan: same pipeline in a child session with the rule on. */
  def merged(spark0: SparkSession, dir: String): DataFrame = {
    val spark = ChildSession(spark0)
    MergeUnionAggregates.install(spark)
    spark.conf.set(MergeUnionAggregates.EnabledKey, "true")
    unionRollup(spark, dir)
  }

  /** The stock three-scan plan (rule off) — the bench ledger's other arm. */
  def stock(spark0: SparkSession, dir: String): DataFrame =
    unionRollup(ChildSession(spark0), dir)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "opt_union_merge_rollup" -> (merged _))

  val oracle: Map[String, String] = Map(
    "opt_union_merge_rollup" ->
      """WITH keyed AS (
  SELECT year(o_orderdate)::INT AS yr, month(o_orderdate)::INT AS mo,
         CAST(o_totalprice AS DECIMAL(14,2)) AS price
  FROM orders)
SELECT * FROM (
  SELECT yr, mo, count(*)::BIGINT AS n_orders,
         (sum(price))::DOUBLE AS total_price
  FROM keyed GROUP BY yr, mo
  UNION ALL
  SELECT yr, NULL::INT AS mo, count(*)::BIGINT, (sum(price))::DOUBLE
  FROM keyed GROUP BY yr
  UNION ALL
  SELECT NULL::INT AS yr, mo, count(*)::BIGINT, (sum(price))::DOUBLE
  FROM keyed GROUP BY mo)
ORDER BY yr ASC NULLS FIRST, mo ASC NULLS FIRST""")
}
