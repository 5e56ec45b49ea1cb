package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.{Alias, Attribute, Cast, Coalesce, Expression, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Materialized-view query rewriting: answer an aggregate query from a
  * registered pre-aggregate instead of the raw table.
  *
  * The reference maintains three matviews and REWRITES ITS QUERIES BY HAND
  * to read them (`sql/03_warehouse.sql:112-156` + the analytics queries
  * that select from `mv_*`). The warehouse-engine version of that contract
  * is automatic: consumers keep writing queries against the RAW tables,
  * and the optimizer substitutes a registered matview whenever it can
  * prove the query derivable from it — the classic aggregate-navigator /
  * summary-table rewrite.
  *
  * Matching scope (v1, deliberately narrow and fully checked — anything
  * outside leaves the plan untouched):
  *
  *  - The query node is `Aggregate(G_q, R_q, C_q)` where `C_q` is a chain
  *    of deterministic Project / SubqueryAlias nodes over a parquet
  *    `LogicalRelation`; the MV's defining plan has the same shape. No
  *    Filters (a filtered query is NOT derivable from an unfiltered
  *    aggregate), no joins (register the joined pipeline's aggregate
  *    directly if needed — the base comparison is by scan identity).
  *  - Bases match iff they scan the same parquet root paths with the same
  *    schema; columns then correspond by position.
  *  - Every query grouping expression, FLATTENED to base-column form,
  *    must semantically equal one of the MV's flattened grouping
  *    expressions. Two match modes, tried in order:
  *      EXACT grain (query grain = view grain as sets): every aggregate —
  *      ANY deterministic function, count distinct / avg / FILTER clauses
  *      included — must equal a view column verbatim, and the whole
  *      Aggregate collapses to a Project over the view scan.
  *      COARSER grain: every aggregate is a non-distinct, unfiltered
  *      Sum / Count / Min / Max whose flattened input matches an MV
  *      partial: Sum merges by Sum (cast back to the original result
  *      type — decimal sums widen per level), Count by `coalesce(sum, 0)`,
  *      Min/Max by themselves. Distinct aggregates bail here — they are
  *      not derivable from a finer grain.
  *
  * The rewrite preserves every output `exprId` and data type (bare
  * grouping attributes are re-aliased onto their original ids), and
  * refuses itself if any reference fails to map — the residual-reference
  * check is the safety net behind the whole match.
  *
  * FRESHNESS is the registrant's contract, not the rule's: [[register]]
  * binds the defining plan to the parquet snapshot that was just written;
  * if the base table changes, re-materialize and re-register (exactly the
  * reference's `refresh_all_warehouse_views()` discipline). The rule is
  * installed session-wide ([[graft.GraftExtensions]]) but fires only when
  * a view is registered AND the session sets [[EnabledKey]] — see the key's
  * doc for why the default is off.
  *
  * At 100 TB this is the difference between a dashboard query scanning a
  * fact partition tree and it scanning kilobytes: the bench `mv_rewrite`
  * ledger prices exactly that substitution (scan rows on vs off).
  */
object MvRewrite extends Rule[LogicalPlan] {

  /** Session opt-in (default OFF, like [[RerollExpandAggregate]]): the
    * catalog object is JVM-global, and a 385-query shared verification
    * session must not have unrelated aggregates silently re-routed
    * through a view another query registered — sound, but it would
    * invalidate every other query's plan gates. The mv queries enable it
    * in child sessions.
    */
  val EnabledKey = "spark.sql.graft.mvRewrite.enabled"

  /** One registered matview: everything needed to recognize and replace. */
  private final case class Entry(
      name: String,
      baseKey: String,                    // parquet roots + schema identity
      baseOutput: Seq[Attribute],         // defining-side base columns
      groupFlat: Seq[Expression],         // flattened grouping exprs (defining base space)
      groupPos: Map[Int, Int],            // grouping index -> mv output column position
      partials: Seq[(AggregateExpression, Int)], // mergeable partials -> mv column position
      aggCols: Seq[(AggregateExpression, Int)],  // ALL aggregate columns (exact path)
      scan: LogicalPlan)                  // analyzed read of the materialized parquet

  private val catalog =
    new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Flatten Project/SubqueryAlias chains: a rewriter taking expressions
    * over `plan`'s output to expressions over the BASE relation's output,
    * plus the base itself. None if the chain contains anything else or a
    * non-deterministic projection.
    */
  private def flatten(plan: LogicalPlan): Option[(Expression => Expression, LogicalPlan)] =
    plan match {
      case p: Project if p.projectList.forall(_.deterministic) =>
        flatten(p.child).map { case (f, base) =>
          val m: Map[Long, Expression] = p.projectList.map {
            case al: Alias    => al.exprId.id -> al.child
            case a: Attribute => a.exprId.id -> (a: Expression)
          }.toMap
          ((e: Expression) => f(e.transformUp {
            case a: Attribute if m.contains(a.exprId.id) => m(a.exprId.id)
          }), base)
        }
      case s: SubqueryAlias => flatten(s.child)
      case other => Some((identity[Expression] _, other))
    }

  /** Query-side flatten: like [[flatten]] but also accepts deterministic
    * [[Filter]] nodes, returning their predicates flattened to base-column
    * form. A filter is DERIVABLE from the view iff its predicate is a
    * function of the view's grouping expressions (checked later, per
    * entry): such a predicate is constant within each leaf group, so
    * filtering base rows and filtering view rows are the same operation —
    * the standard dashboard shape, grain + predicate. The DEFINING side
    * keeps the strict no-filter [[flatten]].
    */
  private def flattenQ(plan: LogicalPlan):
      Option[(Expression => Expression, Seq[Expression], LogicalPlan)] =
    plan match {
      case p: Project if p.projectList.forall(_.deterministic) =>
        flattenQ(p.child).map { case (f, preds, base) =>
          val m: Map[Long, Expression] = p.projectList.map {
            case al: Alias    => al.exprId.id -> al.child
            case a: Attribute => a.exprId.id -> (a: Expression)
          }.toMap
          (((e: Expression) => f(e.transformUp {
            case a: Attribute if m.contains(a.exprId.id) => m(a.exprId.id)
          })), preds, base)
        }
      case fl: org.apache.spark.sql.catalyst.plans.logical.Filter
          if fl.condition.deterministic =>
        // the predicate references the plan BELOW the filter: flatten it
        // with that chain's rewriter; projections above cannot affect it
        flattenQ(fl.child).map { case (f, preds, base) =>
          (f, preds :+ f(fl.condition), base)
        }
      case s: SubqueryAlias => flattenQ(s.child)
      case other => Some((identity[Expression] _, Nil, other))
    }

  /** Identity of a parquet scan: sorted root paths + read schema. */
  private def baseKey(plan: LogicalPlan): Option[String] = plan match {
    case LogicalRelation(fs: HadoopFsRelation, _, _, _, _) =>
      Some(fs.location.rootPaths.map(_.toString).sorted.mkString(",") +
        "|" + fs.schema.catalogString)
    case _ => None
  }

  /** Register a matview: `defining` is the aggregate pipeline the view was
    * computed FROM (raw-table space), `scan` reads the parquet it was
    * just materialized TO (columns in defining-output order). Returns
    * false (and registers nothing) if the defining plan is outside the
    * matchable scope — callers treat that as a hard error in specs.
    */
  def register(name: String, defining: DataFrame, scan: DataFrame): Boolean = {
    // the OPTIMIZED defining plan, not the analyzed one: matching runs
    // inside the optimizer's fixed point, where the query's expressions
    // have already been simplified (SimplifyCasts strips the redundant
    // int cast off year(date), etc.) — the stored twins must be in the
    // same normal form or semantic equality can never hold
    defining.queryExecution.optimizedPlan match {
      case Aggregate(g, r, child, _) =>
        val entry = for {
          (f, base) <- flatten(child)
          key <- baseKey(base)
          groupFlat = g.map(f)
          if groupFlat.forall(_.deterministic)
          // mv output position of each grouping: the result column that is
          // exactly that grouping expression
          groupPos = g.indices.flatMap { i =>
            r.indexWhere {
              case al: Alias    => al.child.semanticEquals(g(i))
              case a: Attribute => a.semanticEquals(g(i))
              case _            => false
            } match {
              case -1  => None
              case pos => Some(i -> pos)
            }
          }.toMap
          if groupPos.size == g.size
          // every deterministic aggregate column (distinct / avg / filtered
          // included) — usable by the EXACT-grain projection path
          aggCols = r.zipWithIndex.flatMap {
            case (al: Alias, pos) => al.child match {
              case ae: AggregateExpression if ae.deterministic =>
                Some((f(ae).asInstanceOf[AggregateExpression], pos))
              case _ => None
            }
            case _ => None
          }
          // the MERGEABLE subset — usable by the coarser-grain re-aggregate
          partials = aggCols.filter { case (ae, _) =>
            !ae.isDistinct && ae.filter.isEmpty && (ae.aggregateFunction match {
              case _: Sum | _: Count | _: Min | _: Max => true
              case _                                   => false
            })
          }
        } yield Entry(name, key, base.output, groupFlat, groupPos, partials,
          aggCols, scan.queryExecution.analyzed)
        entry.foreach(e => catalog.put(name, e))
        entry.isDefined
      case _ => false
    }
  }

  def deregister(name: String): Unit = catalog.remove(name)
  def clear(): Unit = catalog.clear()

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (catalog.isEmpty ||
        !conf.getConfString(EnabledKey, "false").toBoolean) plan
    else plan.transformUp {
      case agg @ Aggregate(_, _, _, _) =>
        rewrite(agg).getOrElse(agg)
    }

  /** Idempotently add the rule to a session's user-provided optimizer
    * batch — the no-configuration path for sessions the library didn't
    * build (mirrors [[EliminateRedundantLeftJoin.install]]).
    */
  def install(spark: org.apache.spark.sql.SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  private def rewrite(agg: Aggregate): Option[LogicalPlan] = {
    val (fq, preds, baseQ) = flattenQ(agg.child).getOrElse(return None)
    val keyQ = baseKey(baseQ).getOrElse(return None)
    val it = catalog.values.iterator
    while (it.hasNext) {
      val e = it.next()
      if (e.baseKey == keyQ) {
        tryEntry(agg, fq, preds, baseQ, e) match {
          case some @ Some(_) => return some
          case None           => ()
        }
      }
    }
    None
  }

  private def tryEntry(agg: Aggregate, fq: Expression => Expression,
      preds: Seq[Expression], baseQ: LogicalPlan, e: Entry): Option[LogicalPlan] = {
    // map the entry's base attrs onto the query's (same schema, by position)
    val baseMap: Map[Long, Attribute] =
      e.baseOutput.map(_.exprId.id).zip(baseQ.output).toMap
    def toQuerySpace(expr: Expression): Expression = expr.transformUp {
      case a: Attribute => baseMap.getOrElse(a.exprId.id, a)
    }
    val mvGroupQ = e.groupFlat.map(toQuerySpace)

    // every query grouping must be one of the MV's groupings
    val scanOut = e.scan.output
    val matchedJs = scala.collection.mutable.Set[Int]()
    val gToScan: Seq[(Expression, Attribute)] = agg.groupingExpressions.map { g =>
      if (!g.deterministic) return None
      val flat = fq(g)
      val j = mvGroupQ.indexWhere(_.semanticEquals(flat))
      if (j < 0) return None
      matchedJs += j
      g -> scanOut(e.groupPos(j))
    }

    // every filter predicate must be a function of the VIEW's grouping
    // expressions (not merely the query's — a filter on mo is derivable
    // from a yr×mo view even when the query groups by yr alone): replace
    // maximal view-grouping subexpressions with scan columns, then demand
    // nothing else remains
    val scanChild: LogicalPlan = {
      val mapped = preds.map { p =>
        val m = p.transformDown {
          case sub if mvGroupQ.exists(_.semanticEquals(sub)) =>
            scanOut(e.groupPos(mvGroupQ.indexWhere(_.semanticEquals(sub))))
        }
        if (!m.references.forall(a => scanOut.exists(_.exprId == a.exprId)))
          return None
        m
      }
      if (mapped.isEmpty) e.scan
      else org.apache.spark.sql.catalyst.plans.logical.Filter(
        mapped.reduce(org.apache.spark.sql.catalyst.expressions.And(_, _)),
        e.scan)
    }

    // ---- EXACT-grain fast path -----------------------------------------
    // When the query's grain IS the view's grain, every aggregate value —
    // including count distinct, averages, and filtered aggregates that the
    // coarser-grain merge below can never derive — is sitting verbatim in
    // a view column: the whole Aggregate collapses to a Project.
    if (matchedJs.size == mvGroupQ.size) {
      val aggColsQ = e.aggCols.map { case (ae, pos) => (toQuerySpace(ae), pos) }
      def exactCol(ae: AggregateExpression): Option[Attribute] = {
        if (!ae.deterministic) return None
        val flat = fq(ae).asInstanceOf[Expression]
        aggColsQ.collectFirst {
          case (p, pos) if p.semanticEquals(flat) => scanOut(pos)
        }
      }
      var allExact = true
      val projected: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
        val t = ne.transformUp {
          case ae: AggregateExpression =>
            exactCol(ae) match {
              case Some(col) => col
              case None      => allExact = false; ae
            }
          case expr if gToScan.exists(_._1.semanticEquals(expr)) =>
            gToScan.find(_._1.semanticEquals(expr)).get._2
        }
        t match {
          case al: Alias    => al
          case a: Attribute if a.exprId == ne.exprId => a
          case other        => Alias(other, ne.name)(exprId = ne.exprId)
        }
      }
      if (allExact &&
          projected.flatMap(_.references).forall(a =>
            scanOut.exists(_.exprId == a.exprId))) {
        val proj = Project(projected, scanChild)
        if (proj.output.map(a => (a.exprId, a.dataType)) ==
            agg.output.map(a => (a.exprId, a.dataType)))
          return Some(proj)
      }
    }

    // every aggregate must merge from an MV partial
    val partialsQ = e.partials.map { case (ae, pos) => (toQuerySpace(ae), pos) }
    def mergeFor(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined || !ae.deterministic) return None
      val flat = fq(ae.aggregateFunction).asInstanceOf[Expression]
      val hit = partialsQ.collectFirst {
        case (p: AggregateExpression, pos)
            if p.aggregateFunction.semanticEquals(flat) => pos
      }
      hit.flatMap { pos =>
        val col = scanOut(pos)
        val fn = ae.aggregateFunction match {
          case s: Sum   => Some(s.copy(child = col))
          case _: Count => Some(Sum(col)) // counts merge by summation
          case m: Min   => Some(m.copy(child = col))
          case m: Max   => Some(m.copy(child = col))
          case _        => None
        }
        fn.map { f =>
          val merged: Expression =
            AggregateExpression(f, ae.mode, isDistinct = false, None)
          val typed =
            if (merged.dataType == ae.dataType) merged
            else Cast(merged, ae.dataType)
          // a GLOBAL query over an empty base: count(*) must be 0, but
          // sum over the (empty) view is null — coalesce restores the
          // count contract (grouped queries never see the difference:
          // every group that exists has partials ≥ 1)
          ae.aggregateFunction match {
            case _: Count => Coalesce(Seq(typed, Literal(0L)))
            case _        => typed
          }
        }
      }
    }

    // transformUp, NOT transformDown: a down-transform recurses into its
    // own replacement, so the merged AggregateExpression (which references
    // scan columns) would be fed straight back into mergeFor and bail
    val newResult: Seq[NamedExpression] = agg.aggregateExpressions.map { ne =>
      var ok = true
      val t = ne.transformUp {
        case ae: AggregateExpression =>
          mergeFor(ae) match {
            case Some(m) => m
            case None    => ok = false; ae
          }
        case expr if gToScan.exists(_._1.semanticEquals(expr)) =>
          gToScan.find(_._1.semanticEquals(expr)).get._2
      }
      if (!ok) return None
      t match {
        case al: Alias   => al
        case a: Attribute =>
          // a bare grouping column was replaced by the scan attribute:
          // restore the original output id for every parent operator
          Alias(a, ne.name)(exprId = ne.exprId)
        case other => Alias(other, ne.name)(exprId = ne.exprId)
      }
    }
    // residual-reference safety net: everything must now live on the scan
    if (!newResult.flatMap(_.references).forall(a =>
        scanOut.exists(_.exprId == a.exprId))) return None

    val rewritten = Aggregate(
      gToScan.map(_._2), newResult, scanChild, agg.hint)
    if (rewritten.output.map(a => (a.exprId, a.dataType)) !=
        agg.output.map(a => (a.exprId, a.dataType))) return None
    Some(rewritten)
  }
}
