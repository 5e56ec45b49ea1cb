package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
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
}
