package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Johnson–Lindenstrauss projection kernel: one `array<float>`
  * embedding → its [[graft.similarity.JlProjection.OutDim]] projected
  * coordinates as `array<double>`, in one compiled loop.
  *
  * Why a custom `Expression` (same story as [[MinHashSignature]]): the
  * declarative form builds 16 projection columns of 64 multiply-add terms
  * each — a ~4,000-node expression tree that costs almost nothing to RUN
  * (2k vectors) but seconds to re-ANALYZE, optimize, and canonicalize on
  * every query construction; `sim_jl_distortion`'s 3–7s bench wall was
  * ~90% planning. Here the whole matrix multiply is one expression node
  * referencing a class-load-constant sign matrix.
  *
  * Value parity (oracle text unchanged, bit-identical coordinates):
  * coordinate j is the strict left-to-right fold
  * `(((e0·s_j0) + e1·s_j1) + …) / 4.0` with each element cast
  * float→double first — exactly [[graft.similarity.JlProjection]]'s
  * column expression and its DuckDB twin. The signs come from the SAME
  * md5-parity derivation ([[graft.similarity.JlProjection.sign]]), so all
  * three forms share the matrix by construction.
  *
  * Null contract: a null array is null (UnaryExpression default); an
  * array shorter than [[graft.similarity.JlProjection.InDim]] or with a
  * null element yields null, matching the declarative chain where a null
  * `getItem` poisons the fold.
  *
  * NON-ANSI contract (spec-pinned in JlKernelSpec): the short-array branch
  * matches the declarative twin only under `spark.sql.ansi.enabled=false`
  * — ANSI `GetArrayItem` THROWS on an out-of-bounds index where this
  * kernel returns null. The embeddings corpus is fixed-width so the branch
  * never fires on real data, but a future ANSI-default Spark would
  * desynchronize the twins on malformed input: the kernel keeps the
  * null-poison semantics DELIBERATELY (an analytics fold over a ragged
  * vector should skip, not kill the job), and the spec pins both this and
  * the well-formed-input parity with ANSI ON so the divergence stays a
  * documented choice, not a surprise.
  */
case class JlProjectVec(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_jl_project expects ARRAY<FLOAT>, got ${other.catalogString}")
  }

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullable: Boolean = true

  override def nullSafeEval(a: Any): Any =
    JlProject.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("jl")
      s"""
         |org.apache.spark.sql.catalyst.util.ArrayData $out =
         |  graft.functions.JlProject.compute($c);
         |if ($out == null) { ${ev.isNull} = true; } else { ${ev.value} = $out; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): JlProjectVec =
    copy(child = newChild)

  override def prettyName: String = "graft_jl_project"
}

object JlProject {

  private val OutDim = graft.similarity.JlProjection.OutDim
  private val InDim = graft.similarity.JlProjection.InDim

  /** The ±1 sign matrix, derived once at class load from the ONE md5
    * parity source both engines interpolate.
    */
  private val S: Array[Array[Double]] =
    Array.tabulate(OutDim, InDim)((j, i) =>
      graft.similarity.JlProjection.sign(j, i).toDouble)

  /** One projection per vector; called from generated code. Returns null
    * (poisoned fold) for short arrays or null elements.
    */
  def compute(a: ArrayData): ArrayData = {
    val n = a.numElements()
    if (n < InDim) return null
    var i = 0
    while (i < InDim) { if (a.isNullAt(i)) return null; i += 1 }
    val e = new Array[Double](InDim)
    i = 0
    while (i < InDim) { e(i) = a.getFloat(i).toDouble; i += 1 }
    val out = new Array[Double](OutDim)
    var j = 0
    while (j < OutDim) {
      val row = S(j)
      var s = 0.0
      i = 0
      while (i < InDim) { s += e(i) * row(i); i += 1 }
      out(j) = s / 4.0
      j += 1
    }
    new GenericArrayData(out)
  }
}
