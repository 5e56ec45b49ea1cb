package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document character-bigram histogram in one compiled pass:
  * `string → array<struct<bg: string, c: bigint>>` of DISTINCT bigrams
  * with their in-document counts.
  *
  * Why a custom `Expression` (the [[MinHashSignature]] pattern): the
  * declarative form of "per-doc bigram counts" is
  * `explode(sequence) → substring → groupBy(doc_id, bg)` — one exploded
  * row PER CHARACTER of the corpus shuffled into a (doc, bigram)
  * aggregate. The counts are a pure per-row fact (all of a document's
  * bigrams live in its own row), so that shuffle moves |corpus| rows to
  * compute something a row-local hash map produces directly; at sf0.1 it
  * was a 10M-row explode + 5.3 MB exchange and the whole query's wall.
  * With the kernel the per-doc pass is map-side, the corpus model rolls
  * up the (alphabet²-bounded) per-doc distinct grams, and the rarity
  * join broadcasts — no corpus-sized shuffle anywhere.
  *
  * Bigram identity matches `substring(t, i, 2)` exactly: Unicode CODE
  * POINTS, not UTF-16 units (Spark's substringSQL and DuckDB's substring
  * both count code points, and the DuckDB oracle is the parity contract).
  * A string shorter than two code points yields an EMPTY array — under
  * `explode` that drops the document, exactly like the oracle's
  * `range(1, length(t))` producing no rows. Output order is first
  * occurrence (deterministic); every consumer aggregates, so order never
  * reaches a result.
  */
case class BigramCounts(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_counts expects STRING, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("bg", StringType, nullable = false),
      StructField("c", LongType, nullable = false))),
    containsNull = false)

  override def nullable: Boolean = child.nullable

  override def nullSafeEval(s: Any): Any =
    BigramCounts.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"${ev.value} = graft.functions.BigramCounts.compute($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): BigramCounts =
    copy(child = newChild)

  override def prettyName: String = "graft_bigram_counts"
}

object BigramCounts {

  /** One histogram per string; called from generated code. */
  def compute(s: UTF8String): ArrayData = {
    val cps = s.toString.codePoints().toArray
    if (cps.length < 2) return new GenericArrayData(Array.empty[Any])
    val m = new java.util.LinkedHashMap[String, Array[Long]]()
    var i = 0
    while (i < cps.length - 1) {
      val bg = new String(cps, i, 2)
      val cell = m.get(bg)
      if (cell == null) m.put(bg, Array(1L)) else cell(0) += 1L
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](
        UTF8String.fromString(e.getKey), e.getValue()(0))): InternalRow
      j += 1
    }
    new GenericArrayData(out)
  }
}
