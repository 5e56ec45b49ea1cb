package graft

import graft.analytics.{GroupingSets, OlsRegression}
import graft.dedup.FuzzyJoin
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.ExpandExec
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}

/** Plan-shape and equivalence gates for the multi-grain aggregation,
  * sufficient-statistics regression, and fuzzy-join modules. Result
  * CORRECTNESS is the DuckDB oracle's job; these specs pin the claims the
  * scaladocs make about HOW the plans execute — the part an oracle compare
  * cannot see.
  */
class MultiGrainSpec extends SparkSpec {

  test("rollup plans Expand; the hierarchical rewrite does not") {
    val expand = collectAll(GroupingSets.rollupMonthly(spark, sf)
      .queryExecution.executedPlan) { case e: ExpandExec => e }
    assert(expand.nonEmpty, "ROLLUP should plan via Expand")
    val rewritten = collectAll(GroupingSets.rollupHierarchical(spark, sf)
      .queryExecution.executedPlan) { case e: ExpandExec => e }
    assert(rewritten.isEmpty,
      "the hierarchical rewrite must not replicate input rows via Expand")
  }

  test("hierarchical rewrite is row-identical to the Expand ROLLUP") {
    val a = GroupingSets.rollupMonthly(spark, sf).collect().toSeq
    val b = GroupingSets.rollupHierarchical(spark, sf).collect().toSeq
    assert(a == b)
  }

  test("grouping_id bit order matches the documented MSB-first contract") {
    // gid for (yr, mo): leaf=0, yr-subtotal=1 (mo grouped out), total=3
    val gids = GroupingSets.rollupMonthly(spark, sf)
      .select("gid").distinct().collect().map(_.getInt(0)).sorted.toSeq
    assert(gids == Seq(0, 1, 3))
  }

  test("grouping-sets plan skips the leaf grain a cube would pay for") {
    val gids = GroupingSets.setsPriority(spark, sf)
      .select("gid").distinct().collect().map(_.getInt(0)).sorted.toSeq
    // (yr)=grouping over (yr, o_orderpriority) -> 01b = 1; (pri) -> 10b = 2;
    // () -> 11b = 3. The 00b leaf grain is absent by construction.
    assert(gids == Seq(1, 2, 3))
  }

  test("ridge Gram fit is ONE aggregate pass, no iteration") {
    val plan = OlsRegression.ridgeGram(spark, sf).queryExecution.executedPlan
    val aggs = collectAll(plan) {
      case a: HashAggregateExec => a
      case a: ObjectHashAggregateExec => a
      case a: SortAggregateExec => a
    }
    // one partial + one final of the SAME aggregate — nothing else
    assert(aggs.size == 2, s"expected partial+final, got ${aggs.size}")
  }

  test("ridge solve is finite and the trend R² lands in [0, 1]") {
    val betas = OlsRegression.ridgeGram(spark, sf).collect().head
    for (i <- 1 to 3)
      assert(!betas.getDouble(i).isNaN && !betas.getDouble(i).isInfinite)
    val r2s = OlsRegression.olsTrend(spark, sf)
      .select("r2").collect().map(_.getDouble(0))
    assert(r2s.nonEmpty && r2s.forall(r => r >= 0.0 && r <= 1.0))
  }

  test("fuzzy join never plans a cartesian or nested-loop product") {
    for (q <- Seq(FuzzyJoin.fuzzyPairs(spark, sf),
        FuzzyJoin.fuzzyKeep(spark, sf),
        FuzzyJoin.fuzzyPairsBanded(spark, sf))) {
      val bad = collectAll(q.queryExecution.executedPlan) {
        case c: CartesianProductExec => c
        case b: BroadcastNestedLoopJoinExec => b
      }
      assert(bad.isEmpty, "block-then-verify must join on the block key")
    }
  }

  test("fuzzy block cap bounds candidate pairs (the quadratic guard)") {
    val stats = FuzzyJoin.blockStats(spark, sf).collect()
    val admitted = stats.filter(_.getAs[Boolean]("admitted"))
    assert(admitted.forall(_.getAs[Long]("block_n") <= FuzzyJoin.MaxBlock))
    // the verified pair count can never exceed the admitted candidate count
    val cand = admitted.map(_.getAs[Long]("cand_pairs")).sum
    val pairs = FuzzyJoin.fuzzyPairs(spark, sf).count()
    assert(pairs <= cand)
  }
}
