package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native winnowing kernel: normalized text → array of selected rolling-hash
  * fingerprints (see [[graft.text.TextAnalysis.winnowFingerprints]] for the
  * algorithm and guarantees).
  *
  * Why a custom `Expression`: the declarative form is two `transform` HOFs —
  * one md5+parse per k-gram, one window-min per position — all interpreted
  * (boxed lambda call per element), measured at 6+ s for 5 k docs at sf0.1;
  * this is the per-document ingest kernel that 100 TB multiplies. Here the
  * whole selection runs as one compiled loop per row ([[WinnowFps.compute]]),
  * invoked from whole-stage codegen.
  *
  * Value parity: hashes are the identical h32 = int(md5(gram)[0:8 hex]) the
  * SQL form computes (java MessageDigest over the UTF-8 bytes of the same
  * character substring), so the DuckDB oracle is unchanged and the output
  * stays bit-identical; the fingerprint SET per document is what downstream
  * consumes (output is exploded + totally ordered).
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression {

  // analysis-time type gate: a named error instead of a runtime
  // ClassCastException from SQL like graft_winnow(123)
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnow expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    WinnowFps.compute(t.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WinnowFps.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)

  override def prettyName: String = "graft_winnow"
}

object WinnowFps {

  /** One pass per document: hash every char k-gram, slide a w-window, keep
    * each window's min, emit distinct selections in first-occurrence order
    * (the `array_distinct(transform(...))` order of the declarative form).
    * Documents with fewer than w grams emit an empty array.
    */
  def compute(t: UTF8String, k: Int, w: Int): ArrayData = {
    val s = t.toString
    // CODE-POINT offsets, not UTF-16 units: SQL substring()/length() (the
    // definition the DuckDB oracle replays) count characters, and a k-gram
    // must never split a surrogate pair. off(i) = char index of the i-th
    // code point; gram i = chars [off(i), off(i+k)).
    val nCp = s.codePointCount(0, s.length)
    val n = nCp - k + 1
    if (n < w) return new GenericArrayData(Array.emptyLongArray)
    val off = new Array[Int](nCp + 1)
    var ci = 0
    var cp = 0
    while (cp < nCp) {
      off(cp) = ci
      ci = s.offsetByCodePoints(ci, 1)
      cp += 1
    }
    off(nCp) = s.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val hs = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = md.digest(s.substring(off(i), off(i + k)).getBytes("UTF-8"))
      hs(i) = Md5Hash.fold(d)
      md.reset()
      i += 1
    }
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    var j = 0
    while (j <= n - w) {
      var m = hs(j)
      var x = 1
      while (x < w) {
        if (hs(j + x) < m) m = hs(j + x)
        x += 1
      }
      seen.add(m)
      j += 1
    }
    val out = new Array[Long](seen.size)
    val it = seen.iterator()
    var o = 0
    while (it.hasNext) { out(o) = it.next(); o += 1 }
    new GenericArrayData(out)
  }
}
