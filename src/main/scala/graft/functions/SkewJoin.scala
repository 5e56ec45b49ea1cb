package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * A shuffle join sends every row of one key to one reducer; a hot key
  * (the null facility, the default diagnosis code, the empty-string label)
  * serializes the whole stage. Salting splits each left-side key into
  * `saltFactor` sub-keys (deterministic hash of a row-unique column — no
  * `rand()`, which breaks retry/replay determinism) and replicates the
  * right side once per salt, restoring parallelism at the cost of a
  * `saltFactor`× blow-up of the (small) right side.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; explicit
  * salting remains the tool when the right side must stay a shuffle join
  * (too big to broadcast) and the skew is known — e.g. the staging feed's
  * null-date key in the reference's incremental ordering.
  */
object SkewJoin {

  /** Join `left` and `right` on `key`, salting `left` by a hash of
    * `leftUniqueCol`. Semantics identical to `left.join(right, key)` for an
    * inner equi-join where `right`'s key is unique or duplicated — every
    * (leftRow, rightRow) key match survives exactly once.
    */
  def saltedInnerJoin(left: DataFrame, right: DataFrame, key: String,
      leftUniqueCol: String, saltFactor: Int = 8): DataFrame = {
    val salted = left.withColumn("__salt",
      pmod(xxhash64(col(leftUniqueCol)), lit(saltFactor)).cast("int"))
    val replicated = right.withColumn("__salt",
      explode(expr(s"sequence(0, ${saltFactor - 1})")))
    salted.join(replicated, Seq(key, "__salt"), "inner").drop("__salt")
  }

  /** Checked operator form: events ⋈ a 5-row type dimension on
    * `event_type` — a maximally skewed key (5 values over the whole feed) —
    * forced down the salted SHUFFLE path (`shuffle_hash` hint denies the
    * broadcast that would otherwise sidestep the skew problem being
    * demonstrated). The output is salting-invariant, identical to the plain
    * inner join, so the DuckDB oracle checks the equivalence contract
    * directly; the salt hash never leaves the plan.
    */
  def skewedTypeJoin(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val dim = Seq(("click", 1.0), ("view", 0.5), ("signup", 5.0),
      ("purchase", 10.0), ("error", 0.0)).toDF("event_type", "type_weight")
      .hint("shuffle_hash")
    saltedInnerJoin(graft.Tables.events(spark, dir), dim, "event_type", "event_id")
      .select($"event_id", $"event_type", $"type_weight",
        ($"value" * $"type_weight").as("weighted_value"))
      .orderBy($"event_id")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "join_skew_salted" -> (skewedTypeJoin _))

  val oracle: Map[String, String] = Map(
    "join_skew_salted" -> """SELECT event_id, event_type,
       type_weight::DOUBLE AS type_weight,
       (value * type_weight::DOUBLE) AS weighted_value
FROM events
JOIN (VALUES ('click', 1.0), ('view', 0.5), ('signup', 5.0),
             ('purchase', 10.0), ('error', 0.0))
  AS dim(event_type, type_weight) USING (event_type)
ORDER BY event_id""")
}
