package graft.plans

import graft.{Memos, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** IVM × set partials: incrementally maintain a `collect_set` view and
  * serve coarser-grain COUNT(DISTINCT) from the refreshed snapshot.
  *
  * The r10 distinct merge ([[MvRewrite]]) answers `count(distinct x)`
  * from a stored `collect_set(x)` — but a 100 TB corpus's view cannot be
  * rebuilt from scratch per batch. Set partials are MERGEABLE state:
  * for a late-arriving delta batch,
  *
  * {{{   sets_v1(g) = array_union(sets_v0(g), collect_set(delta rows in g)) }}}
  *
  * — a full-outer merge AT THE VIEW'S GRAIN between the v0 PARQUET and
  * the delta's own (tiny) set aggregate. The pre-delta fact is never
  * rescanned; counts ride along additively. After the merge the view
  * re-registers at the v1 snapshot (the
  * [[MvWarehouseQueries.ivmRefreshServed]] discipline), and a raw-table
  * `count(distinct)` consumer is served from v1, hash-matching the
  * DuckDB raw recompute — one green row proves delta-merge exactness of
  * the SET state, re-registration, and the distinct rewrite together.
  * Set order after an incremental merge differs from a fresh
  * `collect_set`'s — irrelevant by construction, every set consumer is
  * order-insensitive (the r10 float gate keeps it that way).
  *
  * The delta carve-out (`l_orderkey % LateMod == 0`) models the late
  * batch; both the v0 filter and the delta filter derive from the ONE
  * modulus, so the union of the two partitions is exactly the raw table
  * the oracle recomputes from.
  */
object IvmSetQueries {

  /** Late-batch carve-out modulus (~10% of lineitems arrive "late"). */
  val LateMod = 10

  /** Lineitem, not orders: the MvRewrite catalog is JVM-global, and a
    * second set view over the same base relation would make WHICH view
    * serves a given consumer an iteration-order accident — lineitem has no
    * other registered set view, so the plan gate is deterministic.
    */
  private def keyed(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir).select(
      year($"l_shipdate").cast("int").as("yr"),
      month($"l_shipdate").cast("int").as("mo"),
      $"l_suppkey",
      (pmod($"l_orderkey", lit(LateMod)) === 0).as("late"))
  }

  /** The view pipeline over a slice: (yr, mo) → supplier set + count. */
  private def setsOf(df: DataFrame): DataFrame = {
    df.groupBy(col("yr"), col("mo"))
      .agg(collect_set(col("l_suppkey")).as("supp_set"),
        count(lit(1)).as("n_items"))
  }

  /** Registration defining: the SAME pipeline over the FULL table. */
  private def definingAll(spark: SparkSession, dir: String): DataFrame =
    setsOf(keyed(spark, dir).drop("late"))

  private val refreshed =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Boolean]()

  /** v0 from the on-time slice, delta sets from the late slice, v1 =
    * grain-level full-outer `array_union` merge of v0's PARQUET with the
    * delta — then re-register at v1. Keyed by [[Memos.runTag]] so a bench
    * second sample repeats the refresh, not a memo hit.
    *
    * The tag is recorded only AFTER register succeeds (`computeIfAbsent`
    * drops the mapping if the body throws), and concurrent callers block
    * on the in-flight computation instead of racing past an unregistered
    * view — a failed refresh is retried by the next caller, never
    * silently skipped.
    */
  private def refresh(spark: SparkSession, dir: String): Unit = {
    val tag = s"${spark.sparkContext.applicationId}:$dir:${Memos.runTag}"
    refreshed.computeIfAbsent(tag, _ => { doRefresh(spark, dir, tag); true })
  }

  private def doRefresh(spark: SparkSession, dir: String, tag: String): Unit = {
    import spark.implicits._
    val scratch = s"${sys.props("java.io.tmpdir")}/graft-ivm-set/" +
      tag.replaceAll("[^A-Za-z0-9._-]", "_")
    setsOf(keyed(spark, dir).filter(!$"late"))
      .write.mode("overwrite").parquet(s"$scratch/v0")
    val delta = setsOf(keyed(spark, dir).filter($"late"))
      .withColumnRenamed("supp_set", "d_set")
      .withColumnRenamed("n_items", "d_n")
    val empty = expr("CAST(array() AS ARRAY<BIGINT>)")
    val v1 = spark.read.parquet(s"$scratch/v0")
      .join(delta, Seq("yr", "mo"), "full_outer")
      .select($"yr", $"mo",
        array_union(coalesce($"supp_set", empty), coalesce($"d_set", empty))
          .as("supp_set"),
        (coalesce($"n_items", lit(0L)) + coalesce($"d_n", lit(0L)))
          .as("n_items"))
    v1.write.mode("overwrite").parquet(s"$scratch/v1")
    val ok = MvRewrite.register(s"mv_ivm_supp_sets:$dir",
      definingAll(spark, dir), spark.read.parquet(s"$scratch/v1"))
    require(ok, "mv_ivm_supp_sets must register (structured path)")
  }

  /** The consumer: yearly distinct suppliers + item counts from "raw"
    * lineitem, served from the incrementally-maintained set view.
    */
  def served(spark0: SparkSession, dir: String): DataFrame = {
    val spark = ChildSession(spark0)
    MvRewrite.install(spark)
    spark.conf.set(MvRewrite.EnabledKey, "true")
    refresh(spark, dir)
    import spark.implicits._
    keyed(spark, dir).drop("late")
      .groupBy($"yr")
      .agg(countDistinct($"l_suppkey").as("n_suppliers"),
        count(lit(1)).as("n_items"))
      .orderBy($"yr")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "opt_mv_ivm_distinct" -> (served _))

  /** Raw-table recompute — proves the incremental SET state exact. */
  val oracle: Map[String, String] = Map(
    "opt_mv_ivm_distinct" ->
      """SELECT year(l_shipdate)::INT AS yr,
       count(DISTINCT l_suppkey)::BIGINT AS n_suppliers,
       count(*)::BIGINT AS n_items
FROM lineitem
GROUP BY 1
ORDER BY yr""")
}
