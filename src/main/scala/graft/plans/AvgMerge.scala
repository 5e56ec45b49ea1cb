package graft.plans

import org.apache.spark.sql.catalyst.expressions.{Attribute, Cast, Divide, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Average, Sum}
import org.apache.spark.sql.types.{ByteType, DataType, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** AVG is not self-decomposable, but `avg = merged-sum / merged-count` is —
  * the ONE derivation all three aggregate-moving rewrites share
  * ([[MvRewrite]]'s coarser-grain matview merge, [[EagerAggregation]]'s
  * below-join partial, [[RerollExpandAggregate]]'s below-Expand leaf).
  *
  * Bit-exactness discipline: the re-sum of exact partials (decimal /
  * integral sums) is cast BACK to the partial column's own type — exact,
  * the value IS the original total — and the division replicates
  * [[Average]]'s own evaluate shape: decimal inputs divide as
  * `Divide(sum: sumType, count cast DECIMAL(20,0))` then cast to the avg
  * result type; everything else divides in DOUBLE. So decimal/integral
  * merges equal the direct aggregate to the last bit; float/double inputs
  * re-associate, the same latitude Spark's own partial aggregation takes.
  * Interval averages have no double-division analog — [[supported]] gates
  * them out and callers bail.
  */
object AvgMerge {

  def supported(dt: DataType): Boolean = dt match {
    case _: DecimalType | FloatType | DoubleType => true
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** The merged expression: `sumCol` holds per-group `Sum(avg.child)`
    * partials, `cntCol` per-group `Count(avg.child)` partials; `mode`
    * comes from the aggregate expression being replaced.
    */
  def merge(avg: Average, sumCol: Attribute, cntCol: Attribute,
      mode: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateMode): Expression = {
    val reSum: Expression =
      AggregateExpression(Sum(sumCol), mode, isDistinct = false, None)
    val reCnt: Expression =
      AggregateExpression(Sum(cntCol), mode, isDistinct = false, None)
    val sumBack =
      if (reSum.dataType == sumCol.dataType) reSum
      else Cast(reSum, sumCol.dataType)
    val div = avg.child.dataType match {
      case _: DecimalType =>
        Divide(sumBack, Cast(reCnt, DecimalType(20, 0)))
      case _ => // integral / float / double: Average divides in DOUBLE
        Divide(Cast(sumBack, DoubleType), Cast(reCnt, DoubleType))
    }
    if (div.dataType == avg.dataType) div else Cast(div, avg.dataType)
  }
}
