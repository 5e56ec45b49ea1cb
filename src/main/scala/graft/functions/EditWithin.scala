package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: BANDED Levenshtein distance, saturated at
  * `k + 1`.
  *
  * `graft_edit_within(a, b, k)` returns the exact edit distance when it is
  * ≤ k, and `k + 1` otherwise. The verify stage of an edit-distance fuzzy
  * join ([[graft.dedup.FuzzyJoin]]) only ever asks "is the distance within
  * k?" — but Spark's built-in `levenshtein` fills the full n×m dynamic-
  * program before the comparison throws most of that work away. Cells more
  * than k off the diagonal can never participate in a ≤k path (each step
  * changes the diagonal offset by at most one), so this kernel computes
  * only the 2k+1-wide band — O(n·k) time instead of O(n·m) — and exits as
  * soon as an entire row exceeds k (every later row is monotonically ≥).
  * For the fuzzy join's 120-char prefixes at k=24 that is ~3× fewer cells;
  * on page-length fields the asymptotic gap is what makes candidate
  * verification affordable at all.
  *
  * The saturation contract (`k+1`, never the true distance beyond the
  * band) is what buys the speed — callers comparing `<= k` lose nothing,
  * and [[graft.dedup.FuzzyJoin]]'s banded twin query hash-matches the
  * full-DP oracle because rows beyond k are filtered out on both engines.
  *
  * Distances count UTF-16 code units (Java `String` chars), which agrees
  * with code-point counting on every BML text this library processes;
  * astral-plane pairs may differ from code-point-based engines — the
  * EditWithinSpec parity test pins agreement with Spark's own
  * `levenshtein` on the generated corpus.
  *
  * Null if any input is null. A negative k is clamped to 0 (the expression
  * then answers only "exactly equal?"). Codegen emits one static call
  * ([[EditWithin.banded]]) so the expression stays inside whole-stage
  * codegen like the built-in string functions.
  */
case class EditWithin(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    (first.dataType, second.dataType, third.dataType) match {
      case (StringType, StringType, IntegerType) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"graft_edit_within expects (string, string, int), got " +
          s"(${first.dataType.catalogString}, ${second.dataType.catalogString}, " +
          s"${third.dataType.catalogString})")
    }

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any, k: Any): Any =
    EditWithin.banded(a.asInstanceOf[UTF8String], b.asInstanceOf[UTF8String],
      k.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b, k) =>
      s"${ev.value} = graft.functions.EditWithin.banded($a, $b, $k);")

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): EditWithin =
    copy(first = f, second = s, third = t)

  override def prettyName: String = "graft_edit_within"
}

object EditWithin {

  /** min(levenshtein(a, b), k + 1) via a 2k+1 band with early row exit.
    * Static so generated code calls straight into it (the Spark built-ins'
    * own pattern — the JIT sees one monomorphic call site).
    */
  def banded(ua: UTF8String, ub: UTF8String, k0: Int): Int = {
    val k = if (k0 < 0) 0 else k0
    var a = ua.toString
    var b = ub.toString
    if (a.length < b.length) { val t = a; a = b; b = t } // b is the short side
    val n = a.length
    val m = b.length
    if (n - m > k) return k + 1
    if (m == 0) return n // n - m = n <= k here
    val inf = k + 1
    // dp over the short side; cells outside the band stay at inf. Rows
    // swap by reference: every cell the next row reads is re-written
    // first (band + its two inf sentinels), so stale values never leak.
    var prev = new Array[Int](m + 1)
    var cur = new Array[Int](m + 1)
    var j = 0
    while (j <= m) { prev(j) = if (j <= k) j else inf; j += 1 }
    var i = 1
    while (i <= n) {
      val lo = if (i - k > 1) i - k else 1
      val hi = if (i + k < m) i + k else m
      cur(0) = if (i <= k) i else inf
      if (lo > 1) cur(lo - 1) = inf
      var rowMin = cur(0)
      if (lo > 1) rowMin = inf
      val ca = a.charAt(i - 1)
      j = lo
      while (j <= hi) {
        val sub = prev(j - 1) + (if (ca == b.charAt(j - 1)) 0 else 1)
        val del = if (prev(j) < inf) prev(j) + 1 else inf
        val ins = if (cur(j - 1) < inf) cur(j - 1) + 1 else inf
        var v = if (sub < del) sub else del
        if (ins < v) v = ins
        if (v > inf) v = inf
        cur(j) = v
        if (v < rowMin) rowMin = v
        j += 1
      }
      if (hi < m) cur(hi + 1) = inf
      if (rowMin >= inf) return inf // the whole band exceeded k: done
      val t = prev; prev = cur; cur = t
      i += 1
    }
    if (prev(m) > inf) inf else prev(m)
  }
}
