package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the ubiquitous windowed top-k pattern
  *
  *   Project(cols..., Filter(rn <= k, Window(rn = row_number() over
  *     (partition by K order by S), ...)))
  *
  * into the bounded-heap [[TopKPerKeyNode]] whenever the rank column
  * itself is NOT in the final projection. The window formulation fully
  * sorts every key group to produce ranks that the query immediately
  * discards; the heap keeps k rows per key in O(n log k) with no sort.
  * Spark's own InferWindowGroupLimit only pre-prunes the window input —
  * this removes the sort+window entirely.
  *
  * Deliberately narrow: single row_number window expression, a single
  * rank comparison as the whole filter condition, non-empty partition
  * keys, deterministic projection. Ties behave as in the window
  * formulation (both keep exactly k rows, tie choice unspecified unless
  * the ordering is total — same contract row_number gives).
  */
object WindowTopKRule extends Rule[LogicalPlan] {

  /** The rank attribute possibly wrapped in an int/long cast. */
  private def rankRef(e: Expression, rn: Attribute): Boolean = e match {
    case a: Attribute => a.semanticEquals(rn)
    case Cast(a: Attribute, IntegerType | LongType, _, _) => a.semanticEquals(rn)
    case _ => false
  }

  private def intOf(l: Literal): Option[Int] = l match {
    case Literal(v: Int, IntegerType) => Some(v)
    case Literal(v: Long, LongType) if v <= Int.MaxValue => Some(v.toInt)
    case _ => None
  }

  /** cond as "rank <= k" with k >= 1, if it has exactly that shape. */
  private def limitOf(cond: Expression, rn: Attribute): Option[Int] = (cond match {
    case LessThanOrEqual(r, l: Literal) if rankRef(r, rn) => intOf(l)
    case LessThan(r, l: Literal) if rankRef(r, rn) => intOf(l).map(_ - 1)
    case GreaterThanOrEqual(l: Literal, r) if rankRef(r, rn) => intOf(l)
    case GreaterThan(l: Literal, r) if rankRef(r, rn) => intOf(l).map(_ - 1)
    case EqualTo(r, l: Literal) if rankRef(r, rn) => intOf(l).filter(_ == 1)
    case EqualTo(l: Literal, r) if rankRef(r, rn) => intOf(l).filter(_ == 1)
    case _ => None
  }).filter(_ >= 1)

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Project(projList,
        Filter(cond,
          Window(Seq(alias @ Alias(WindowExpression(RowNumber(), _), _)), part, order, child, _)))
        if part.nonEmpty && order.nonEmpty &&
          limitOf(cond, alias.toAttribute).isDefined &&
          !projList.exists(_.references.contains(alias.toAttribute)) &&
          projList.forall(_.deterministic) =>
      Project(projList, TopKPerKeyNode(part, order, limitOf(cond, alias.toAttribute).get, child))
  }
}
