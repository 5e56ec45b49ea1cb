package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine 32-bit hash base shared by the seeded-hash operator families
  * (MinHash permutations, SimHash bit words, LSH hyperplane components).
  *
  * Round 1-3 derived these from `xxhash64`, which DuckDB lacks — so the three
  * hash-family queries could only be spec-pinned, never oracle-checked. md5
  * IS shared by both engines (already load-bearing in the seeded-sample /
  * fingerprint oracles), so every derived hash value here is reproducible in
  * DuckDB SQL and the families become hash-comparable end to end:
  *
  *   h32(x) = int(md5(x)[0:8 hex])  ∈ [0, 2^32)
  *
  *  - Spark:  `cast(conv(substring(md5(x), 1, 8), 16, 10) as bigint)`
  *  - DuckDB: `list_sum(list_transform(range(0, 8), i ->
  *              (strpos('0123456789abcdef', substring(md5(x), i+1, 1)) - 1)
  *                ::BIGINT << (4*(7-i))))`
  *  - Scala (for plan-time constants): [[md5Int]]
  *
  * All three produce the identical integer, so any arithmetic built on top
  * (universal-hash permutations mod 2^31−1, sign tests, bucket ids) is
  * engine-independent by construction. 32 bits is deliberate: products like
  * a·h (a, h < 2^31) stay inside signed-64 range on both engines with no
  * overflow semantics in play.
  */
object Md5Hash {

  /** 2^31 − 1 (Mersenne prime) — the modulus for universal-hash permutations;
    * keeps every derived value positive and every product < 2^62.
    */
  val P: Long = 2147483647L

  /** Spark column: h32 of `c` (a string column). */
  def h32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("bigint")

  /** DuckDB SQL fragment: parse 8 hex chars of `strExpr` starting at
    * 1-based `start` as a 32-bit unsigned value.
    *
    * The outer `::BIGINT` matters: DuckDB's `list_sum` over BIGINT widens to
    * HUGEINT, which pandas materializes as float64 while Spark emits int64 —
    * the driver's dtype-sensitive value hash then mismatches on any query
    * that *emits* the raw hash column (values are identical). Casting back
    * keeps every h32 consumer int64 on both engines.
    */
  def hexParseSql(strExpr: String, start: Int = 1): String =
    s"""(list_sum(list_transform(range(0, 8), i ->
       |    (strpos('0123456789abcdef', substring($strExpr, i+$start, 1)) - 1)::BIGINT
       |      << (4*(7-i)))))::BIGINT""".stripMargin

  /** DuckDB SQL fragment: h32 of `expr` (a VARCHAR expression). */
  def h32Sql(expr: String): String = hexParseSql(s"md5($expr)")

  /** Scala twin of [[h32]] for deriving plan-time constants (permutation
    * coefficients, hyperplane components) that are interpolated as literals
    * into BOTH engines' plans.
    */
  def md5Int(s: String): Long =
    fold(java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")))

  /** The single h32 byte-fold: first 4 md5 bytes big-endian — shared by
    * [[md5Int]] and the per-row kernels ([[WinnowFps]]) so the parity
    * definition lives in exactly one place.
    */
  def fold(d: Array[Byte]): Long =
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
      ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
}
