package graft.analytics

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over a join-derived edge table — the second
  * graph-compute class beside [[graft.dedup.DupClusters]]' connected
  * components: weighted PageRank on the nation-to-nation trade network
  * (customer's nation → supplier's nation, weighted by lineitem count).
  *
  * The 100 TB shape: the edge list is built once by the usual fact join and
  * aggregated to (src, dst, w) — after that every iteration is one
  * hash-shuffle (contributions grouped by dst) joined back to the node set,
  * exactly the DupClusters loop shape. Node count is small (nations) but
  * nothing in the plan depends on that; the same DAG runs on a billion-node
  * edge table (ranks co-shuffle with edges on src; at that scale you'd also
  * bucket both by src).
  *
  * Cross-engine exactness: ranks are FIXED-POINT BIGINTs ([[Scale]] units
  * per 1.0), every step is integer multiply / integer `div` / integer sum —
  * associative at any shuffle order and bit-identical in DuckDB's unrolled
  * CTE twin. No float ever enters the loop; the presentation `pagerank`
  * double is one terminal division. Damping 0.85 is the integer pair
  * (85, 100). Products stay far inside signed-64: rank ≤ ~n·Scale = 2.5e10,
  * edge weight ≤ 6e5 at sf0.1 → rank·w ≤ 1.5e16.
  */
object GraphOps {

  /** Fixed-point units per 1.0 of rank mass. */
  val Scale = 1000000000L

  /** Damping numerator/denominator (0.85) and its complement (0.15). */
  val DampNum = 85L
  val BaseNum = 15L

  /** PageRank iterations — unrolled identically in the DuckDB twin. */
  val Iterations = 3

  /** (src, dst, w): directed trade edges, self-loops excluded. */
  private[graft] def tradeEdges(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    Tables.lineitem(spark, dir)
      .select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(spark, dir).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(spark, dir)
        .select($"c_custkey", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(spark, dir)
        .select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .filter($"c_nationkey" =!= $"s_nationkey")
      .groupBy($"c_nationkey".as("src"), $"s_nationkey".as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  /** Weighted PageRank over the trade network, [[Iterations]] fixed-point
    * rounds from a uniform start. Dangling mass (nations with no exports)
    * is allowed to leak — the conventional simplification, identical in the
    * twin; nations with no imports still receive the base (1−d) mass via
    * the LEFT join.
    */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val edges = tradeEdges(spark, dir)
    val outw = edges.groupBy($"src".as("o_src")).agg(sum($"w").as("ow"))
    val ew = edges.join(outw, $"src" === $"o_src")
      .select($"src", $"dst", $"w", $"ow")
    val nodes = Tables.nation(spark, dir)
      .select($"n_nationkey".as("v"), $"n_name")
    var ranks = nodes.select($"v", lit(Scale).as("r"))
    for (_ <- 1 to Iterations) {
      val contrib = ew.join(ranks, $"src" === $"v")
        .select($"dst", expr("(r * w) div ow").as("c"))
        .groupBy($"dst").agg(sum($"c").as("cin"))
      ranks = nodes.select($"v")
        .join(contrib, $"v" === $"dst", "left")
        .select($"v",
          (lit(BaseNum * Scale / 100L)
            + expr(s"($DampNum * coalesce(cin, 0L)) div 100")).as("r"))
    }
    nodes.join(ranks, Seq("v"))
      .select($"n_name", $"r".as("rank_scaled"),
        ($"r".cast("double") / lit(Scale.toDouble)).as("pagerank"))
      .orderBy($"rank_scaled".desc, $"n_name")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "graph_pagerank" -> (pagerank _))

  private val edgesSql: String = """SELECT c_nationkey AS src,
         s_nationkey AS dst, count(*)::BIGINT AS w
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  WHERE c_nationkey <> s_nationkey
  GROUP BY 1, 2"""

  /** One unrolled iteration: ranks `prev(v, r)` → next ranks. */
  private def iterSql(prev: String): String = s"""SELECT n.v,
         (${BaseNum * Scale / 100L} + ($DampNum * coalesce(s.cin, 0)) // 100)
           ::BIGINT AS r
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS v, sum((p.r * e.w) // e.ow)::BIGINT AS cin
    FROM ew e JOIN $prev p ON e.src = p.v
    GROUP BY 1) s ON n.v = s.v"""

  val oracle: Map[String, String] = Map(
    "graph_pagerank" -> s"""WITH edges AS (
  $edgesSql),
ew AS (
  SELECT src, dst, w, sum(w) OVER (PARTITION BY src)::BIGINT AS ow
  FROM edges),
nodes AS (SELECT n_nationkey AS v, n_name FROM nation),
r0 AS (SELECT v, ${Scale}::BIGINT AS r FROM nodes),
r1 AS (${iterSql("r0")}),
r2 AS (${iterSql("r1")}),
r3 AS (${iterSql("r2")})
SELECT n_name, r AS rank_scaled, r::DOUBLE / CAST($Scale AS DOUBLE) AS pagerank
FROM r3 JOIN nodes USING (v)
ORDER BY rank_scaled DESC, n_name""")
}
