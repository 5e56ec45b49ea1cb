package graft.warehouse

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-driven skew planning — the MEASUREMENT half of the salted-join
  * story ([[graft.functions.SkewJoin]] is the execution half).
  *
  * A shuffle join's wall-clock is its hottest reducer. Before choosing a
  * mitigation (salt factor, AQE skew thresholds, broadcast) you need the
  * key-frequency profile of the join column — at 100 TB that profile is
  * itself a first-class query you run BEFORE the expensive join, exactly
  * like the reference inspects `pg_stat` row counts before sizing batches
  * (`src/etl_pipeline.py:205-234`). This advisor reports, per hot key:
  *
  *  - `key_rows`: exact frequency (one keyed COUNT — map-side combined);
  *  - `share_pct`: its fraction of the feed (single division, ×100);
  *  - `salt`: the recommended salt factor `ceil(key_rows / TargetRows)` —
  *    the sub-task count that caps every salted partition at
  *    [[TargetRows]] rows (integer arithmetic, engine-identical).
  *
  * A key is "hot" when it exceeds [[HotFactor]]× its fair share
  * (n_rows / n_keys) — the relative test detects skew at ANY scale factor,
  * where an absolute row threshold would silently go quiet at small SF and
  * fire on everything at large SF. All thresholds are single Scala values
  * interpolated into both engines (parity rule).
  *
  * Everything is one pass over the key column: COUNT per key, a broadcast
  * 1-row margin for totals, and a filter — no join, no window, no sort
  * beyond the final (tiny) hot-key report ordering.
  */
object SkewAdvisor {

  /** Target rows per salted sub-task — ONE definition in both engines. */
  val TargetRows = 500L

  /** Hot iff key_rows > HotFactor × fair share. */
  val HotFactor = 2L

  /** Skew profile of the `events.event_type` join key (the library's
    * canonical skewed key: a handful of types over the whole feed, the
    * shape of the reference's modality column, `sql/01_schema.sql:110`).
    */
  def skewAdvisor(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val freq = Tables.events(spark, dir)
      .groupBy($"event_type").agg(count(lit(1)).as("key_rows"))
    val totals = freq.agg(sum($"key_rows").as("n_rows"),
      count(lit(1)).as("n_keys"))
    freq.crossJoin(broadcast(totals))
      .filter($"key_rows" * $"n_keys" > lit(HotFactor) * $"n_rows")
      .select($"event_type", $"key_rows",
        ($"key_rows".cast("double") * 100 / $"n_rows").as("share_pct"),
        (($"key_rows" + lit(TargetRows - 1)) / lit(TargetRows))
          .cast("bigint").as("salt"))
      .orderBy($"key_rows".desc, $"event_type")
  }

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "wh_skew_advisor" -> (skewAdvisor _))

  val oracle: Map[String, String] = Map(
    "wh_skew_advisor" -> s"""WITH freq AS (
  SELECT event_type, count(*)::BIGINT AS key_rows
  FROM events GROUP BY 1),
tot AS (
  SELECT sum(key_rows)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys
  FROM freq)
SELECT event_type, key_rows,
       key_rows::DOUBLE * 100 / n_rows AS share_pct,
       ((key_rows + ${TargetRows - 1}) // $TargetRows)::BIGINT AS salt
FROM freq CROSS JOIN tot
WHERE key_rows * n_keys > $HotFactor * n_rows
ORDER BY key_rows DESC, event_type""")
}
