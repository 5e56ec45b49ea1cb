package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The native top-k aggregate ([[graft.functions.TopKIdsAgg]]) must select
  * EXACTLY the rows the ranked-window idiom it replaced selects — the
  * window form is the cross-engine parity contract (the hubness oracles
  * rank with `row_number() OVER (ORDER BY cos DESC, nid)`), so any
  * selection or tie-break drift would silently desynchronize
  * sim_hubness / sim_hubness_ann.
  */
class TopKIdsSpec extends SparkSpec {

  private def registered() = GraftExtensions.registerAll(spark)

  test("aggregate selection == ranked window selection, ties and small groups included") {
    registered()
    import spark.implicits._
    // deterministic fixture with: duplicate scores (tie-break on id),
    // groups smaller than k, negative and zero scores — and spread over
    // many partitions so partial/merge paths genuinely run
    val k = 5
    val rows = for {
      g <- 0 until 37
      i <- 0 until (g % 9) + 1   // group sizes 1..9 straddle k
    } yield (g.toLong, ((g * 31 + i * 17) % 7).toDouble / 3.0 - 0.5, (i * 13 % 11).toLong * 100 + g)
    val df = rows.toDF("g", "score", "id").repartition(13)
    val agg = df.groupBy($"g")
      .agg(expr(s"graft_topk_ids(score, id, $k)").as("ids"))
      .select($"g", posexplode($"ids"))
      .select($"g", ($"pos" + 1).as("rk"), $"col".as("id"))
    val win = df
      .withColumn("rk", row_number().over(
        Window.partitionBy($"g").orderBy($"score".desc, $"id")))
      .filter($"rk" <= k)
      .select($"g", $"rk".cast("long").as("rk"), $"id")
    assert(agg.exceptAll(win).isEmpty && win.exceptAll(agg).isEmpty,
      "aggregate top-k must equal the ranked-window top-k row-for-row")
  }

  test("null scores are skipped, matching a DESC window with >= k non-null rows") {
    registered()
    import spark.implicits._
    val df = Seq(
      (1L, Some(3.0), 10L), (1L, None, 1L), (1L, Some(2.0), 11L),
      (1L, Some(1.0), 12L), (2L, None, 9L)
    ).toDF("g", "score", "id")
    val out = df.groupBy($"g")
      .agg(expr("graft_topk_ids(score, id, 2)").as("ids"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(out(1L) == Seq(10L, 11L), s"got ${out(1L)}")
    assert(out(2L) == Seq.empty, "all-null group yields an empty ranking")
  }

  test("parallelism invariance: 1 partition == 16 partitions") {
    registered()
    import spark.implicits._
    val rows = (0 until 500).map(i =>
      ((i % 7).toLong, ((i * 37) % 23).toDouble, i.toLong))
    val one = rows.toDF("g", "score", "id").coalesce(1)
      .groupBy($"g").agg(expr("graft_topk_ids(score, id, 4)").as("ids"))
      .orderBy($"g").collect().map(_.getSeq[Long](1).toList).toList
    val many = rows.toDF("g", "score", "id").repartition(16)
      .groupBy($"g").agg(expr("graft_topk_ids(score, id, 4)").as("ids"))
      .orderBy($"g").collect().map(_.getSeq[Long](1).toList).toList
    assert(one == many, "merge order must not change the selection")
  }
}
