package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{And, Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Generated-column partition transitivity: derive PARTITION-column
  * predicates from DATA-column predicates, so a date-ranged query prunes
  * a derived-key partition layout it never names.
  *
  * The cluster-scale fact layout here
  * ([[graft.warehouse.PartitionedFact.factByMonth]], the reference's
  * month-bucketed reporting grain re-landed as `month_key=yyyyMM/`
  * directories) partitions by a column COMPUTED from a data column:
  * `month_key = date_key div 100`. Every consumer that filters on the
  * partition column prunes for free — but real dashboards filter on the
  * DATA column (`WHERE date_key BETWEEN 19960115 AND 19960420`), and no
  * stock Catalyst rule connects the two: the scan lists and reads every
  * partition of a 100 TB layout to apply a four-month predicate.
  * Engines with generated-column metadata (Delta's `GENERATED ALWAYS
  * AS`, Hive's partition-expression pruning) close this gap in the
  * catalog; this rule closes it for plain parquet layouts via an
  * explicit registration the layout WRITER makes:
  *
  * {{{ DerivedPartitionFilter.register(path, "date_key", "month_key", 100L) }}}
  *
  * asserting the write-time invariant `month_key = date_key div 100` on
  * every row under `path` (both integral, non-negative domain — yyyyMMdd
  * ints here). Division by a positive constant is monotone
  * non-decreasing, so for a filter conjunct on the data column the rule
  * APPENDS the implied conjunct on the partition column:
  *
  *  - `d >= A` / `d > A`  →  `p >= A div 100`
  *  - `d <= B` / `d < B`  →  `p <= B div 100`
  *  - `d = C`             →  `p = C div 100`
  *  - `d IN (…)`          →  `p IN (distinct div 100 …)`
  *
  * The ORIGINAL predicate always stays (exactness is its job; the
  * implied conjunct is strictly weaker row-wise), so the rewrite is
  * sound unconditionally: any row the implied conjunct drops was
  * already dropped by the original (monotonicity), and a null data
  * value nulls both. What the implied conjunct ADDS is plan-level:
  * [[org.apache.spark.sql.execution.datasources.FileSourceStrategy]]
  * splits it into the scan's `PartitionFilters`, so the layout prunes
  * to the named months BEFORE listing a data file — at 100 TB the
  * difference between reading 4 directories and reading ~84
  * (DerivedPartitionSpec pins the executed scan's partition filter and
  * row parity; the bench `derived_dpp` ledger prices it).
  *
  * Scope guards (any miss leaves the plan untouched): the filter must
  * sit on the registered relation itself (through SubqueryAlias only —
  * after predicate pushdown that IS the shape), the predicate attribute
  * must resolve by exprId to the relation's own data column, literals
  * must be non-negative integrals, and a conjunct already implied (by a
  * previous pass — this rule is fixed-point safe) is never re-added.
  * Ships session-gated like every graft rule ([[EnabledKey]], default
  * off) and registers nothing by itself: no registration, no match.
  */
object DerivedPartitionFilter extends Rule[LogicalPlan] with PredicateHelper {

  /** Session opt-in (default OFF, consistent with the other graft rules). */
  val EnabledKey = "spark.sql.graft.derivedPartitionFilter.enabled"

  /** One write-time invariant: every row under `pathPrefix` satisfies
    * `partCol = dataCol div divisor` (integral, non-negative domain).
    */
  final case class Derivation(pathPrefix: String, dataCol: String,
      partCol: String, divisor: Long) {
    require(divisor > 0, "divisor must be positive (monotone division)")
  }

  private val registry =
    new java.util.concurrent.CopyOnWriteArrayList[Derivation]()

  /** Declare a layout invariant (idempotent). The WRITER calls this right
    * after landing the partitioned layout — the registration is the same
    * assertion a generated-column DDL makes in catalog-backed engines.
    */
  def register(pathPrefix: String, dataCol: String, partCol: String,
      divisor: Long): Unit = {
    val d = Derivation(pathPrefix, dataCol, partCol, divisor)
    if (!registry.contains(d)) registry.add(d)
  }

  def clear(): Unit = registry.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty ||
        !conf.getConfString(EnabledKey, "false").toBoolean) plan
    else plan.transformUp {
      case f @ Filter(cond, child) =>
        derive(cond, child).map(extra => Filter(And(cond, extra), child))
          .getOrElse(f)
    }

  private def unwrap(plan: LogicalPlan): LogicalPlan = plan match {
    case s: SubqueryAlias => unwrap(s.child)
    case other            => other
  }

  /** The conjunction of newly-implied partition predicates for this
    * filter, or None when nothing (new) is derivable.
    */
  private def derive(cond: Expression, child: LogicalPlan): Option[Expression] = {
    val rel = unwrap(child) match {
      case lr @ LogicalRelation(fs: HadoopFsRelation, _, _, _, _) => (lr, fs)
      case _ => return None
    }
    val (lr, fs) = rel
    // scheme-insensitive compare: the writer registers "/tmp/…" while the
    // read-back location reports "file:/tmp/…"
    def norm(p: String): String =
      new org.apache.hadoop.fs.Path(p).toUri.getPath
    val roots = fs.location.rootPaths.map(p => norm(p.toString))
    // segment-aware prefix: "/x/neg" must not claim "/x/neg-unreg"
    def under(root: String, prefix: String): Boolean =
      root == prefix || root.startsWith(prefix + "/")
    val ds = registry.toArray(Array.empty[Derivation]).toSeq.filter(d =>
      roots.nonEmpty && roots.forall(under(_, norm(d.pathPrefix))))
    if (ds.isEmpty) return None
    val conjuncts = splitConjunctivePredicates(cond)
    val implied = scala.collection.mutable.ArrayBuffer[Expression]()
    for (d <- ds) {
      // the predicate attribute must BE the relation's data column (by
      // exprId — a computed look-alike from a projection never reaches
      // here because the filter sits on the relation itself)
      val dataAttr = lr.output.find(_.name == d.dataCol)
      val partAttr = lr.output.find(_.name == d.partCol)
      (dataAttr, partAttr) match {
        case (Some(da), Some(pa)) =>
          def lit(v: Long): Option[Literal] = {
            val q = v / d.divisor
            pa.dataType match {
              case LongType    => Some(Literal(q))
              case IntegerType if q.isValidInt => Some(Literal(q.toInt))
              case ShortType   if q.isValidShort => Some(Literal(q.toShort))
              case ByteType    if q.isValidByte => Some(Literal(q.toByte))
              case _           => None
            }
          }
          def longOf(l: Literal): Option[Long] = l.value match {
            case null => None
            case v: java.lang.Number
                if (l.dataType == LongType || l.dataType == IntegerType ||
                  l.dataType == ShortType || l.dataType == ByteType) &&
                  v.longValue() >= 0 => Some(v.longValue())
            case _ => None
          }
          def isData(e: Expression): Boolean = e match {
            case a: Attribute => a.exprId == da.exprId
            case _            => false
          }
          conjuncts.foreach {
            case GreaterThanOrEqual(a, l: Literal) if isData(a) =>
              for (v <- longOf(l); p <- lit(v)) implied += GreaterThanOrEqual(pa, p)
            case GreaterThan(a, l: Literal) if isData(a) =>
              for (v <- longOf(l); p <- lit(v)) implied += GreaterThanOrEqual(pa, p)
            case LessThanOrEqual(a, l: Literal) if isData(a) =>
              for (v <- longOf(l); p <- lit(v)) implied += LessThanOrEqual(pa, p)
            case LessThan(a, l: Literal) if isData(a) =>
              for (v <- longOf(l); p <- lit(v)) implied += LessThanOrEqual(pa, p)
            // mirrored literal-first forms
            case GreaterThanOrEqual(l: Literal, a) if isData(a) => // lit >= d  ⟺  d <= lit
              for (v <- longOf(l); p <- lit(v)) implied += LessThanOrEqual(pa, p)
            case LessThanOrEqual(l: Literal, a) if isData(a) =>
              for (v <- longOf(l); p <- lit(v)) implied += GreaterThanOrEqual(pa, p)
            case GreaterThan(l: Literal, a) if isData(a) =>
              for (v <- longOf(l); p <- lit(v)) implied += LessThanOrEqual(pa, p)
            case LessThan(l: Literal, a) if isData(a) =>
              for (v <- longOf(l); p <- lit(v)) implied += GreaterThanOrEqual(pa, p)
            case EqualTo(a, l: Literal) if isData(a) =>
              for (v <- longOf(l); p <- lit(v)) implied += EqualTo(pa, p)
            case EqualTo(l: Literal, a) if isData(a) =>
              for (v <- longOf(l); p <- lit(v)) implied += EqualTo(pa, p)
            case In(a, vs) if isData(a) && vs.nonEmpty &&
                vs.forall(_.isInstanceOf[Literal]) =>
              val ps = vs.flatMap(v => longOf(v.asInstanceOf[Literal]).flatMap(lit))
              if (ps.size == vs.size) implied += In(pa, ps.distinct)
            case _ => ()
          }
        case _ => ()
      }
    }
    // fixed-point safety: only conjuncts not already present count as new
    val fresh = implied.filter(e => !conjuncts.exists(_.semanticEquals(e)))
      .foldLeft(Seq.empty[Expression]) { (acc, e) =>
        if (acc.exists(_.semanticEquals(e))) acc else acc :+ e
      }
    if (fresh.isEmpty) None else Some(fresh.reduce(And(_, _)))
  }

  /** Idempotent post-hoc install (mirrors the other graft rules). */
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }
}
