package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: cosine similarity of two `array<float>`
  * embedding columns, accumulated in double.
  *
  * Why a custom `Expression` rather than `aggregate(zip_with(...))`: Spark's
  * higher-order functions evaluate their lambda per element through the
  * interpreter (a `LambdaFunction` call per element, boxing every float), and
  * sit outside whole-stage codegen. For ANN-style workloads the similarity
  * kernel is the innermost loop of an n×m pair scan — at 4 M pairs × 64 dims
  * that is ~0.5 G lambda invocations interpreted vs one fused primitive loop
  * here (`doGenCode` emits the loop straight into the generated stage).
  *
  * Semantics: null if either side is null, either array is empty, lengths
  * differ, a norm is zero, or ANY element of either array is null (the
  * `zip_with` null-propagation contract — a primitive `getFloat` on a null
  * slot would otherwise silently read 0.0 from UnsafeArrayData and produce a
  * wrong cosine instead of a null).
  *
  * The reference declares `VECTOR(768)` for future embedding similarity and
  * never implements it (`/root/reference/sql/01_schema.sql:95`, `README.md:330`)
  * — this is that capability, Spark-native.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  // analysis-time type gate: graft_cosine is SQL-reachable (GraftExtensions),
  // so bad input must be a named error, not a runtime ClassCastException
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val want = ArrayType(FloatType, containsNull = false)
    def ok(e: Expression) = e.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    }
    if (ok(left) && ok(right))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_cosine expects (${want.catalogString}, ${want.catalogString}), " +
          s"got (${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n == 0 || n != b.numElements()) return null
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) null
    else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      s"""
         |final int $n = $a.numElements();
         |if ($n == 0 || $n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0, $na = 0.0, $nb = 0.0;
         |  int $i = 0;
         |  for (; $i < $n; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) break;
         |    final double $x = (double) $a.getFloat($i);
         |    final double $y = (double) $b.getFloat($i);
         |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
         |  }
         |  if ($i < $n || $na == 0.0 || $nb == 0.0) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimilarity =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_cosine"
}
