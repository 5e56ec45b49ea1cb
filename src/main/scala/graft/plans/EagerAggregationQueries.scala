package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing proof queries for [[EagerAggregation]].
  *
  * The star shape: `orders` (fact) inner-joined to a per-customer segment
  * dim, aggregated by segment. The dim side is `dropDuplicates(c_custkey)`
  * — the structural uniqueness evidence the rule requires (customers are
  * unique on their key in the data, so the dedup is a no-op on ROWS, but
  * a bare scan carries no such proof and would not qualify). The DuckDB
  * oracles join the raw customer table for the same reason.
  *
  *  - `opt_eager_agg` — rule ON in a child session: the fact side
  *    collapses to one row per (customer, year-grain) BEFORE the join
  *    (EagerAggSpec gates the Aggregate-below-Join shape).
  *  - `opt_eager_agg_base` — the identical pipeline, stock session: the
  *    join moves every order row. Same oracle; the registered pair prices
  *    the rewrite in every bench run.
  *
  * Both queries group by a dim attribute AND a fact-side expression
  * (order year), exercising the mixed-grouping path where the fact-side
  * grouping joins the leaf keys.
  */
object EagerAggregationQueries {

  private def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = Tables.customer(spark, dir)
      .select($"c_custkey", $"c_mktsegment")
      .dropDuplicates("c_custkey")
    Tables.orders(spark, dir)
      .select($"o_custkey",
        year($"o_orderdate").cast("int").as("yr"),
        expr("CAST(o_totalprice AS DECIMAL(14,2))").as("price"))
      .join(dim, $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"yr")
      .agg(count(lit(1)).as("n_orders"),
        expr("CAST(sum(price) AS DOUBLE)").as("total_price"),
        expr("CAST(max(price) AS DOUBLE)").as("max_price"))
      .orderBy($"c_mktsegment", $"yr")
  }

  def eager(spark0: SparkSession, dir: String): DataFrame = {
    val spark = spark0.newSession()
    EagerAggregation.install(spark)
    spark.conf.set(EagerAggregation.EnabledKey, "true")
    pipeline(spark, dir)
  }

  def baseline(spark: SparkSession, dir: String): DataFrame =
    pipeline(spark, dir)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "opt_eager_agg" -> (eager _),
    "opt_eager_agg_base" -> (baseline _))

  private val sql =
    """SELECT c_mktsegment, year(o_orderdate)::INT AS yr,
       count(*)::BIGINT AS n_orders,
       (sum(CAST(o_totalprice AS DECIMAL(14,2))))::DOUBLE AS total_price,
       (max(CAST(o_totalprice AS DECIMAL(14,2))))::DOUBLE AS max_price
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1, 2
ORDER BY c_mktsegment, yr"""

  /** Same oracle for both — identical results, different plan. */
  val oracle: Map[String, String] = Map(
    "opt_eager_agg" -> sql,
    "opt_eager_agg_base" -> sql)
}
