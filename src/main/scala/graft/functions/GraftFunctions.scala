package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic scalar helpers shared by queries and the oracle SQL.
  *
  * The reference displays ratios with PostgreSQL `ROUND(x::NUMERIC, 2)`
  * (`/root/reference/sql/analytics_queries.sql:13,52,63-65,...`). Spark's
  * `round(double)` goes through `BigDecimal.valueOf` (shortest decimal
  * string, HALF_UP) while DuckDB rounds the raw binary double — the two
  * disagree on values whose shortest representation ends exactly in a
  * half-digit (e.g. 2.675). To make the oracle hash-compare robust we use an
  * explicit closed-form rounding, `floor(x * 100 + 0.5) / 100.0`, and emit
  * the *identical* expression in the DuckDB oracle SQL: identical IEEE-754
  * inputs + identical operations = bit-identical outputs on both engines.
  */
object GraftFunctions {

  /** round-half-up to 2 decimals; oracle-SQL twin: `FLOOR(x * 100 + 0.5) / 100.0`. */
  def round2(c: Column): Column = floor(c * 100 + lit(0.5)) / lit(100.0)

  /** exact percentage `a * 100.0 / b`; oracle twin: `a * 100.0 / b`. */
  def pct(a: Column, b: Column): Column = a * lit(100.0) / b
}
