package graft

import graft.functions.SkewJoin
import org.apache.spark.sql.functions._

/** Scale-path variants: approximate distinct aggregation (the 100 TB
  * substitute for exact COUNT DISTINCT) and the salted skew-join utility —
  * both checked against their exact twins.
  */
class ScaleVariantsSpec extends SparkSpec {
  import spark.implicits._

  test("approx_count_distinct tracks the exact distinct counts within 5%") {
    val fact = warehouse.Warehouse.forDir(spark, sf).factEncounters
    val Array(exactP, exactE) = fact.agg(
      countDistinct($"patient_key"), countDistinct($"encounter_key"))
      .head().toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    // rsd 1% (the knob a 100 TB deployment tunes against sketch memory)
    val Array(apxP, apxE) = fact.agg(
      approx_count_distinct($"patient_key", 0.01),
      approx_count_distinct($"encounter_key", 0.01))
      .head().toSeq.map(_.asInstanceOf[Long].toDouble).toArray
    assert(math.abs(apxP - exactP) / exactP < 0.04, s"$apxP vs $exactP")
    assert(math.abs(apxE - exactE) / exactE < 0.04, s"$apxE vs $exactE")
  }

  test("salted inner join equals the plain join on a skewed key") {
    // skewed left: 90% of lineitem assigned one hot supplier bucket
    val left = Tables.lineitem(spark, sf)
      .select($"l_orderkey", $"l_linenumber",
        when(pmod($"l_orderkey", lit(10)) < 9, 0)
          .otherwise(pmod($"l_orderkey", lit(5))).cast("int").as("bucket"))
    val right = Seq((0, "hot"), (1, "a"), (2, "b"), (3, "c"), (4, "d"))
      .toDF("bucket", "label")
    val plain = left.join(right, Seq("bucket"), "inner")
      .select($"l_orderkey", $"l_linenumber", $"bucket", $"label")
    val salted = SkewJoin.saltedInnerJoin(left, right, "bucket", "l_orderkey")
      .select($"l_orderkey", $"l_linenumber", $"bucket", $"label")
    assert(salted.count() == plain.count())
    assert(salted.except(plain).count() == 0)
    assert(plain.except(salted).count() == 0)
  }
}
