package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.DoubleType

/** Optimizer rule (SURVEY.md §7.3, the third extension tier next to
  * expressions and planner strategies): rewrites the canonical grouped
  * top-k formulation
  *
  *   df.withColumn("rn", row_number().over(partitionBy(k).orderBy(o.desc)))
  *     .filter($"rn" <= k)
  *
  * to run the window over [[TopKPerKey]], whose partial stage trims
  * map-side with bounded heaps (O(n log k), ≤ k rows per key per
  * partition into the shuffle) where the built-in WindowGroupLimit
  * pushdown sorts whole partitions (O(n log n)). The Filter and Window
  * stay in place — the window re-derives identical row numbers over
  * the ≤ k surviving rows, so the plan's output schema and values are
  * unchanged.
  *
  * Fires only when the rewrite is provably value-preserving AND a
  * strict improvement:
  *  - the ONLY window expression is the filtered row_number;
  *  - single partition key (a multi-column key would hash the exchange
  *    on struct(parts), which does not satisfy the window's clustering
  *    on the bare columns — EnsureRequirements would add a second
  *    shuffle and the rewrite would pessimize);
  *  - single descending sort key of non-nullable DoubleType (the exec
  *    orders by one double and drops null orders — a nullable key
  *    could lose rows that row_number would have ranked);
  *  - deterministic sort key, literal bound, k > 0;
  *  - no TopKPerKey already under the window (fixed-point re-entry
  *    guard that sees through pruning Projects).
  * Ties at the k boundary pick an arbitrary winner — exactly as
  * row_number over a non-total order already does; the rewrite adds no
  * new nondeterminism (same caveat as WindowGroupLimit).
  */
object RowNumberTopKRule extends Rule[LogicalPlan] {

  private object RnLimit {
    def unapply(e: Expression): Option[(Attribute, Int)] = e match {
      case LessThanOrEqual(a: Attribute, IntegerLiteral(k)) => Some((a, k))
      case LessThan(a: Attribute, IntegerLiteral(k)) => Some((a, k - 1))
      case GreaterThanOrEqual(IntegerLiteral(k), a: Attribute) => Some((a, k))
      case GreaterThan(IntegerLiteral(k), a: Attribute) => Some((a, k - 1))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(RnLimit(rn, k),
        w @ Window(Seq(al @ Alias(WindowExpression(_: RowNumber, _), _)),
          parts, Seq(SortOrder(ord, Descending, NullsLast, _)), child, _))
        if k > 0 && rn.exprId == al.exprId && parts.size == 1 &&
          ord.dataType == DoubleType && !ord.nullable && ord.deterministic &&
          !child.exists(_.isInstanceOf[TopKPerKey]) =>
      f.copy(child = w.copy(child = TopKPerKey(parts.head, ord, k, child)))
  }
}
