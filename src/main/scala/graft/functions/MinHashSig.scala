package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash-signature kernel: text → the 32 permutation-min values of
  * its word-3-gram shingle set ([[graft.dedup.MinHashLsh]]'s signature, one
  * compiled loop per row).
  *
  * Why a custom `Expression` (same story as [[WinnowFingerprints]]): the
  * declarative form — `split` → shingle `transform` → md5 `transform` → 32
  * `array_min(transform(...))` — is all interpreted higher-order functions,
  * and optimizer project-collapsing re-inlines the upstream arrays into
  * every consumer, so the streaming near-dedup's per-batch cost was pure
  * signature evaluation (r10 profile: 10–14 s of a 15 s wall for 6.7k docs
  * at sf0.1, AND run-over-run degradation in the batch twin). Here the
  * whole chain is one tight loop invoked from whole-stage codegen.
  *
  * Value parity (oracle text unchanged, bit-identical buckets):
  * trim/lower via UTF8String (SQL semantics — trim strips 0x20 only),
  * `\s+` split with Java regex (what Spark's `split` runs), shingle =
  * `tok[i] ' ' tok[i+1] ' ' tok[i+2]`, h = [[Md5Hash.fold]] of the md5 —
  * exactly `conv(substring(md5(s),1,8),16,10)` — mod [[Md5Hash.P]], then
  * min over `(h*a + b) % P` per coefficient pair. Duplicate shingles can't
  * move a min, so the declarative `array_distinct` needs no twin. Docs with
  * <3 tokens return an EMPTY array (the caller filters on size, like the
  * declarative `size(sh) > 0`).
  */
case class MinHashSignature(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_minhash_sig expects STRING, got ${child.dataType.catalogString}")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(t: Any): Any =
    MinHashSig.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.MinHashSig.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash_sig"
}

object MinHashSig {

  // the ONE coefficient source ([[graft.dedup.MinHashLsh.Coeffs]]), copied
  // into primitive arrays once at class-load for the hot loop
  private val A: Array[Long] = graft.dedup.MinHashLsh.Coeffs.map(_._1).toArray
  private val B: Array[Long] = graft.dedup.MinHashLsh.Coeffs.map(_._2).toArray
  private val P: Long = Md5Hash.P

  /** One pass per document; called from generated code. */
  def compute(t: UTF8String): ArrayData = {
    val s = t.trim().toLowerCase().toString
    val toks = s.split("\\s+", -1)
    val n = toks.length
    if (n < 3) return new GenericArrayData(Array.emptyLongArray)
    val k = A.length
    val mins = new Array[Long](k)
    java.util.Arrays.fill(mins, Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("MD5")
    val sb = new java.lang.StringBuilder()
    var i = 0
    while (i + 2 < n) {
      sb.setLength(0)
      sb.append(toks(i)).append(' ').append(toks(i + 1))
        .append(' ').append(toks(i + 2))
      val h = Md5Hash.fold(
        md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))) % P
      md.reset()
      var j = 0
      while (j < k) {
        val v = (h * A(j) + B(j)) % P
        if (v < mins(j)) mins(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }
}
