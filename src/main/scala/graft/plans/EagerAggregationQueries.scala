package graft.plans

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-facing proof queries for [[EagerAggregation]].
  *
  * The shape where eager aggregation actually pays: `lineitem` (fact,
  * ~4 rows per order) inner-joined to a per-order priority dim that is
  * TOO BIG TO BROADCAST — the 100 TB star, where the join itself must
  * shuffle the fact. Both twins run with the broadcast threshold off so
  * they price the same sort-merge join; the rewrite then shrinks the
  * fact exchange from one row per line item to one row per order (the
  * leaf grain), BEFORE the join. A broadcast-able dim would make the
  * rewrite cost-NEGATIVE here (the off-plan ships no fact rows at all
  * while the leaf grain barely collapses) — which is exactly why the
  * rule is a cost-based opt-in and why this pair pins the shape where
  * turning it on is right.
  *
  * The dim side is `dropDuplicates(o_orderkey)` — the structural
  * uniqueness evidence the rule requires (orders are unique on their key
  * in the data, so the dedup is a no-op on ROWS, but a bare scan carries
  * no such proof and would not qualify). The DuckDB oracles join the raw
  * orders table for the same reason. Money rides exact integer cents.
  *
  *  - `opt_eager_agg` — rule ON: fact collapses to order grain before
  *    the join (EagerAggSpec gates the Aggregate-below-Join shape; the
  *    bench `eager_agg` ledger records the shuffle-byte drop).
  *  - `opt_eager_agg_base` — identical pipeline, rule OFF: the join
  *    moves every line item. Same oracle — identical results, two plans.
  *
  * Measured at sf0.1 (local[8], warm): shuffle bytes HALVE (4.2 MB →
  * from 8.1 MB; 4× fewer rows, each ~2× wider with its partials) while
  * wall stays near parity — a single-box in-memory shuffle makes the
  * saved bytes nearly free and the extra aggregate costs real CPU. The
  * byte term is the one that turns into network + spill on a cluster;
  * the CPU term stays constant per row. That trade is the ledger's
  * point, stated, not hidden.
  */
object EagerAggregationQueries {

  private def pipeline(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = Tables.orders(spark, dir)
      .select($"o_orderkey", $"o_orderpriority")
      .dropDuplicates("o_orderkey")
    Tables.lineitem(spark, dir)
      .select($"l_orderkey",
        expr("CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)")
          .as("cents"))
      .join(dim, $"l_orderkey" === $"o_orderkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        sum($"cents").as("gross_cents"),
        max($"cents").as("max_cents"),
        // avg rides the AvgMerge two-partial path: the leaf stores
        // Sum(cents)+Count(cents), the top divides the re-sums — exact
        // BIGINT totals, so the DOUBLE division is bit-identical to the
        // direct aggregate (and to the oracle's sum::DOUBLE / count)
        avg($"cents").as("avg_cents"))
      .orderBy($"o_orderpriority")
  }

  /** Child session for BOTH twins: broadcast denied (the dim is modeled
    * as cluster-scale), differing only in the rule flag.
    */
  private def session(spark0: SparkSession, enabled: Boolean): SparkSession = {
    val spark = ChildSession(spark0)
    EagerAggregation.install(spark)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set(EagerAggregation.EnabledKey, enabled.toString)
    spark
  }

  def eager(spark0: SparkSession, dir: String): DataFrame =
    pipeline(session(spark0, enabled = true), dir)

  def baseline(spark0: SparkSession, dir: String): DataFrame =
    pipeline(session(spark0, enabled = false), dir)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "opt_eager_agg" -> (eager _),
    "opt_eager_agg_base" -> (baseline _))

  private val sql =
    """SELECT o_orderpriority,
       count(*)::BIGINT AS n_items,
       sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT AS gross_cents,
       max(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::BIGINT AS max_cents,
       (sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT))::DOUBLE
          / count(*)) AS avg_cents
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY 1
ORDER BY o_orderpriority"""

  /** Same oracle for both — identical results, different plan. */
  val oracle: Map[String, String] = Map(
    "opt_eager_agg" -> sql,
    "opt_eager_agg_base" -> sql)
}
