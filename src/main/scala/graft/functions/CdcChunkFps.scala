package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking of one document in one compiled pass:
  * `string → array<struct<fp: string, s: int>>` — the md5 fingerprint and
  * start token position of every CDC chunk, in chunk order.
  *
  * Why a custom `Expression` (the [[BigramCounts]] / [[MinHashSignature]]
  * pattern): a document's chunking is a ROW-LOCAL fact — boundaries
  * depend only on the document's own token k-grams — yet the declarative
  * form computed it with `posexplode(every token) → per-doc window
  * prefix-sum → groupBy(doc, chunk) collect_list`, i.e. two corpus-sized
  * token shuffles to assemble strings each input row already held. The
  * kernel emits finished (fingerprint, start) chunk rows map-side; the
  * only shuffle the CDC ledger still pays is the one its semantics
  * actually need — the CROSS-document keep-first canonicalization on the
  * fingerprint key, which moves 2 small columns per chunk instead of
  * every token.
  *
  * Parity contract (the DuckDB oracle is unchanged, so every step must
  * match the declarative twin bit-for-bit):
  *  - tokens: `split(trim(lower(text)), "\\s+")` — applied here with the
  *    SAME UTF8String trim/toLowerCase and Java regex split (limit −1)
  *    Spark's functions evaluate; an empty string tokenizes to [""], one
  *    chunk of the empty token, exactly like the explode pipeline;
  *  - boundary after token p iff `p + gramK ≤ n` and
  *    [[Md5Hash.fold]] (the shared h32 definition) of the k-gram joined
  *    by one space satisfies `h % divisor == 0`;
  *  - fingerprint: lowercase md5 hex of the chunk's tokens joined by one
  *    space — byte-identical to `md5(array_join(...))`.
  * A null document is null (UnaryExpression default) and drops under
  * `explode`, like the old pipeline's null token array.
  */
case class CdcChunkFps(child: Expression, gramK: Int, divisor: Int)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_cdc_chunks expects STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", StringType, nullable = false),
      StructField("s", IntegerType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    CdcChunkFps.compute(s.asInstanceOf[UTF8String], gramK, divisor)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.CdcChunkFps.compute($c, $gramK, $divisor);"
    })

  override protected def withNewChildInternal(newChild: Expression): CdcChunkFps =
    copy(child = newChild)

  override def prettyName: String = "graft_cdc_chunks"
}

object CdcChunkFps {

  private val Ws = java.util.regex.Pattern.compile("\\s+")
  private val HexDigits = "0123456789abcdef".toCharArray

  private def md5Hex(md: java.security.MessageDigest, s: String): String = {
    md.reset()
    val d = md.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** One chunking per document; called from generated code. */
  def compute(s: UTF8String, gramK: Int, divisor: Int): ArrayData = {
    val toks = Ws.split(s.trim().toLowerCase().toString, -1)
    val n = toks.length
    val md = java.security.MessageDigest.getInstance("MD5")
    def h32(g: String): Long = {
      md.reset(); Md5Hash.fold(md.digest(g.getBytes("UTF-8")))
    }
    val chunks = new scala.collection.mutable.ArrayBuffer[InternalRow]()
    val sb = new java.lang.StringBuilder()
    var start = 0
    var p = 0
    while (p < n) {
      if (sb.length() > 0) sb.append(' ')
      sb.append(toks(p))
      val boundary = p + gramK <= n && {
        val g = new java.lang.StringBuilder(toks(p))
        var j = 1
        while (j < gramK) { g.append(' ').append(toks(p + j)); j += 1 }
        h32(g.toString) % divisor == 0
      }
      if (boundary || p == n - 1) {
        chunks += new GenericInternalRow(Array[Any](
          UTF8String.fromString(md5Hex(md, sb.toString)), start))
        sb.setLength(0)
        start = p + 1
      }
      p += 1
    }
    new GenericArrayData(chunks.toArray[Any])
  }
}
