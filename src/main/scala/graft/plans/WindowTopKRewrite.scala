package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule completing the custom-operator stack (SURVEY.md §7.3
  * path c): users write the standard filtered-row_number idiom
  *
  *   df.withColumn("rn", row_number().over(Window.partitionBy(k).orderBy(o)))
  *     .filter($"rn" <= k).drop("rn")
  *
  * and the rule rewrites the optimized
  * `Project(Filter(rn <= k, Window(row_number, part, ord)))` shape into
  * [[TopKPerKeyPlan]] — per-key bounded heaps instead of the window
  * operator's full per-partition sort (see [[TopKPerKeyExec]] for the
  * at-scale argument: O(n log k) streaming pass, k rows per key
  * resident, vs O(n log n) sort + spill).
  *
  * Fires only when the rewrite is provably safe:
  *  - the single window expression is `row_number()` over the default
  *    rank frame (rank/dense_rank have tie semantics a heap can't
  *    reproduce);
  *  - the rank column is consumed by the filter and NOT referenced in
  *    the projection (the operator does not output it);
  *  - partition and order specs are non-empty and deterministic;
  *  - the bound is a literal with 1 ≤ k ≤ [[WindowTopKRewrite.MaxK]] —
  *    beyond that the heaps' k·|keys| working set stops beating the
  *    sort and the window form is left alone.
  *
  * Tie behavior: when the order is not total, `row_number` picks an
  * arbitrary (sort-stability-dependent) k rows per key; the heap picks
  * an equally arbitrary k. Both are valid answers of the same
  * nondeterministic query — identical whenever the order is total,
  * which every oracle-checked query pins.
  *
  * Installed via [[graft.GraftExtensions]] (`injectOptimizerRule`) or
  * [[graft.GraftSession.attach]] (`experimental.extraOptimizations`).
  * In the latter the rule runs after the built-in batches, so it also
  * strips the [[WindowGroupLimit]] node `InferWindowGroupLimit` may
  * already have inserted below the window (the group-limit is
  * subsumed: its exec would re-require a sort). Kill switch:
  * `spark.graft.topkRewrite.enabled=false`.
  */
object WindowTopKRewrite extends Rule[LogicalPlan] {

  val MaxK = 4096

  // Top-down traversal, NOT transformUp: bottom-up would visit the
  // Filter child first, so the bare-Filter case would consume every
  // Project(Filter(Window)) occurrence before the Project case could
  // match its parent — and each rewrite would pay the rank-emitting
  // path even when the projection drops `rn`. Going top-down, the
  // Project case claims the shape first and computes `needsRank` from
  // the real consumer; the Filter case only sees rank-kept queries.
  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString("spark.graft.topkRewrite.enabled", "true").toBoolean) plan
    else plan.transformDown {
      case p @ Project(projectList, Filter(cond, w: Window)) =>
        rewrite(projectList, cond, w).getOrElse(p)
      // No Project above the Filter — the rank column is part of the
      // query output. Rewrite with an identity projection; the rank
      // reference makes the operator emit row_number natively.
      case f @ Filter(cond, w: Window) =>
        rewrite(w.output, cond, w).getOrElse(f)
    }

  private def rewrite(
      projectList: Seq[NamedExpression],
      cond: Expression,
      w: Window): Option[LogicalPlan] =
    for {
      rn <- rowNumberOutput(w)
      if w.partitionSpec.nonEmpty && w.orderSpec.nonEmpty
      if w.partitionSpec.forall(_.deterministic) && w.orderSpec.forall(_.deterministic)
      k <- rankBound(cond, rn.exprId)
      if k >= 1 && k <= MaxK
    } yield {
      // When the projection keeps the rank column, the operator emits
      // it natively (1-based position in each key's sorted drain —
      // exactly the row_number() value for the surviving rows).
      val needsRank = projectList.exists(_.references.contains(rn.toAttribute))
      // Tie caveat, logged on EVERY rewrite (totality of the order
      // spec is not decidable cheaply here, so we do not try): when
      // duplicate sort keys exist within a key group, the heap may
      // keep different tie rows than the window's full sort would
      // have — both are valid answers, but users who relied on the
      // de-facto stable row_number pick should know.
      logInfo(s"graft: rewriting filtered row_number window (k=$k, " +
        s"partition=${w.partitionSpec.mkString(",")}, order=${w.orderSpec.mkString(",")}) " +
        "to TopKPerKey; if the order is not total, tie rows may differ from the " +
        "window form (disable via spark.graft.topkRewrite.enabled=false)")
      Project(projectList,
        TopKPerKeyPlan(w.partitionSpec, w.orderSpec, k, stripGroupLimit(w.child),
          if (needsRank) Some(rn.toAttribute) else None))
    }

  /** The window's single expression, iff it is `row_number()` over the
    * default rank frame. */
  private def rowNumberOutput(w: Window): Option[Alias] = w.windowExpressions match {
    case Seq(a @ Alias(WindowExpression(RowNumber(),
        WindowSpecDefinition(_, _,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)) => Some(a)
    case _ => None
  }

  /** `rn <= k` / `rn < k+1` / `k >= rn` / `rn = 1`, through any cast
    * the user put on the rank column. */
  private def rankBound(cond: Expression, rn: ExprId): Option[Int] = {
    def isRn(e: Expression): Boolean = stripCast(e) match {
      case a: AttributeReference => a.exprId == rn
      case _ => false
    }
    cond match {
      case LessThanOrEqual(l, r) if isRn(l)                     => litInt(r)
      case LessThan(l, r) if isRn(l)                            => litInt(r).map(_ - 1)
      case GreaterThanOrEqual(l, r) if isRn(r)                  => litInt(l)
      case GreaterThan(l, r) if isRn(r)                         => litInt(l).map(_ - 1)
      case EqualTo(l, r) if isRn(l) && litInt(r).contains(1)    => Some(1)
      case EqualTo(l, r) if isRn(r) && litInt(l).contains(1)    => Some(1)
      case _                                                    => None
    }
  }

  private def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other   => other
  }

  private def litInt(e: Expression): Option[Int] = e match {
    case Literal(v: Int, _)                         => Some(v)
    case Literal(v: Long, _) if v <= Int.MaxValue   => Some(v.toInt)
    case _                                          => None
  }

  private def stripGroupLimit(p: LogicalPlan): LogicalPlan = p match {
    case wgl: WindowGroupLimit => wgl.child
    case other                 => other
  }
}
