package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, LongType}

/** Native Catalyst expression: dot product of an `array<float>` embedding
  * with a CONSTANT hyperplane, the signature kernel of the random-hyperplane
  * LSH family ([[graft.similarity.RandomHyperplaneLsh]]).
  *
  * `right` is the md5-derived integer components as a foldable array literal
  * (`array(hL, ...)`); each is mapped once at plan time to the component
  * double `h / 2^31 − 1 ∈ [−1, 1)` — the identical exact operations the
  * DuckDB oracle performs in-engine, so signatures stay bit-reproducible.
  * Accumulation is double, strictly left-to-right (the cross-engine float
  * parity order).
  *
  * Why a custom `Expression` rather than `aggregate(zip_with(...))`: same
  * reason as [[CosineSimilarity]] — higher-order functions interpret their
  * lambda per element outside whole-stage codegen, and the signature is
  * evaluated `Planes` times per corpus row on every index build; `doGenCode`
  * emits one fused primitive loop over a referenced `double[]` instead.
  *
  * Null if the embedding is null, its length differs from the plane's, the
  * plane literal is null or carries a null element, or any embedding element
  * is null (mirrors `zip_with`'s null propagation).
  */
case class PlaneDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // analysis-time type gate: graft_plane_dot is SQL-reachable
  // (GraftExtensions) — reject wrong types and a non-foldable plane with a
  // named error instead of a runtime ClassCastException / wrong constant
  override def checkInputDataTypes():
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _), ArrayType(LongType, _)) =>
        if (right.foldable) TypeCheckSuccess
        else TypeCheckFailure(
          "graft_plane_dot's plane must be a foldable array literal")
      case (l, r) => TypeCheckFailure(
        "graft_plane_dot expects (array<float>, array<bigint> literal), " +
          s"got (${l.catalogString}, ${r.catalogString})")
    }
  }

  override def dataType: DataType = DoubleType

  override def nullable: Boolean = true

  // the plane literal folds to a constant; extract + scale it exactly once.
  // A null plane literal or a plane containing a null element folds to null
  // components → the expression is constant-null (zip_with's null semantics),
  // NOT an NPE at codegen time (the type gate can't see literal VALUES).
  private lazy val components: Array[Double] = {
    val v = right.eval(null)
    if (v == null) null
    else {
      val ad = v.asInstanceOf[ArrayData]
      var i = 0
      var hasNull = false
      while (i < ad.numElements() && !hasNull) {
        hasNull = ad.isNullAt(i); i += 1
      }
      if (hasNull) null
      else ad.toLongArray().map(h => h / 2147483648.0 - 1.0)
    }
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    if (components == null) return null
    val a = l.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n != components.length) return null
    var dot = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i)) return null
      dot += a.getFloat(i).toDouble * components(i)
      i += 1
    }
    dot
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    if (components == null)
      return nullSafeCodeGen(ctx, ev, (_, _) => s"${ev.isNull} = true;")
    val cs = ctx.addReferenceObj("planeComponents", components, "double[]")
    nullSafeCodeGen(ctx, ev, (a, _) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      s"""
         |final int $n = $a.numElements();
         |if ($n != $cs.length) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $dot = 0.0;
         |  int $i = 0;
         |  for (; $i < $n; $i++) {
         |    if ($a.isNullAt($i)) break;
         |    $dot += ((double) $a.getFloat($i)) * $cs[$i];
         |  }
         |  if ($i < $n) {
         |    ${ev.isNull} = true;
         |  } else {
         |    ${ev.value} = $dot;
         |  }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): PlaneDot =
    copy(left = newLeft, right = newRight)

  override def prettyName: String = "graft_plane_dot"
}
