package graft

import graft.observability.ColumnLineage
import org.apache.spark.sql.functions._

/** Plan-walk coverage for [[ColumnLineage]] beyond the oracle-checked
  * canonical query: generators, unions, dedup keys, and literal-born
  * columns each exercise a distinct branch of the walk.
  */
class ColumnLineageSpec extends SparkSpec {
  import spark.implicits._

  test("explode traces generator output to the generator's inputs") {
    val q = Tables.documents(spark, sf)
      .select($"doc_id", explode(split($"text", " ")).as("token"))
    val edges = ColumnLineage.lineage(q)
    assert(edges.contains(("token", "documents", "text", "value")))
    assert(edges.contains(("doc_id", "documents", "doc_id", "value")))
  }

  test("union merges value sources per output position") {
    val a = Tables.orders(spark, sf).select($"o_orderkey".as("k"))
    val b = Tables.lineitem(spark, sf).select($"l_orderkey".as("k"))
    val edges = ColumnLineage.lineage(a.unionByName(b))
    assert(edges.contains(("k", "orders", "o_orderkey", "value")))
    assert(edges.contains(("k", "lineitem", "l_orderkey", "value")))
  }

  test("dropDuplicates keys become predicate edges") {
    val q = Tables.orders(spark, sf)
      .select($"o_orderkey", $"o_orderstatus")
      .dropDuplicates("o_orderstatus")
    val edges = ColumnLineage.lineage(q)
    assert(edges.contains(("*", "orders", "o_orderstatus", "predicate")))
  }

  test("literal-born columns have no source edge") {
    val q = Tables.orders(spark, sf)
      .select($"o_orderkey", lit(1).as("one"),
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy($"o_orderkey")).as("rn"))
    val edges = ColumnLineage.lineage(q)
    assert(!edges.exists(e => e._1 == "one"),
      "a literal column must not claim a source")
    // rn DOES have a source: its order is decided by o_orderkey
    assert(edges.contains(("rn", "orders", "o_orderkey", "value")))
  }

  test("computed columns union the sources of every referenced input") {
    val o = Tables.orders(spark, sf)
    val c = Tables.customer(spark, sf)
    val q = o.join(c, o("o_custkey") === c("c_custkey"))
      .select(concat($"o_orderstatus", lit(":"), $"c_mktsegment").as("tag"))
    val edges = ColumnLineage.lineage(q)
    assert(edges.contains(("tag", "orders", "o_orderstatus", "value")))
    assert(edges.contains(("tag", "customer", "c_mktsegment", "value")))
    assert(edges.contains(("*", "orders", "o_custkey", "predicate")))
    assert(edges.contains(("*", "customer", "c_custkey", "predicate")))
  }

  test("rollup/cube (Expand) outputs keep their sources; grouping flags stay literal-born") {
    val q = Tables.orders(spark, sf)
      .select(year($"o_orderdate").as("y"), $"o_orderstatus".as("status"))
      .rollup($"y", $"status")
      .agg(count(lit(1)).as("n"), grouping($"y").cast("int").as("g_y"))
    val edges = ColumnLineage.lineage(q)
    // pre-fix, Expand's fresh exprIds severed these — both were empty
    assert(edges.contains(("y", "orders", "o_orderdate", "value")))
    assert(edges.contains(("status", "orders", "o_orderstatus", "value")))
    assert(!edges.exists(e => e._1 == "n" || e._1 == "g_y"),
      "count(1) and grouping() are literal-born")
  }

  test("streaming plans trace columns to their stream source") {
    val stream = spark.readStream
      .schema(org.apache.spark.sql.types.StructType.fromDDL(
        "event_id BIGINT, ts TIMESTAMP, value DOUBLE"))
      .parquet(java.nio.file.Files.createTempDirectory("lineage-stream").toString)
      .filter($"value" > 0)
      .select($"event_id", ($"value" * 2).as("doubled"))
    val edges = ColumnLineage.lineage(stream)
    assert(edges.contains(("doubled", "stream:FileSource", "value", "value")))
    assert(edges.contains(("event_id", "stream:FileSource", "event_id", "value")))
    assert(edges.contains(("*", "stream:FileSource", "value", "predicate")))
  }

  test("grouping sets via SQL GROUPING SETS also trace through Expand") {
    Tables.orders(spark, sf).createOrReplaceTempView("lin_orders")
    val q = spark.sql(
      """SELECT o_orderpriority, o_orderstatus, count(1) AS n
        |FROM lin_orders
        |GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))""".stripMargin)
    val edges = ColumnLineage.lineage(q)
    assert(edges.contains(("o_orderpriority", "orders", "o_orderpriority", "value")))
    assert(edges.contains(("o_orderstatus", "orders", "o_orderstatus", "value")))
  }
}
