package graft

import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Plan lint over the ENTIRE query inventory: no operator may plan a
  * Cartesian product (both sides unbounded — the accidental-cross-join
  * scale killer) or a global sort (single-partition ordering; top-k
  * must be TakeOrderedAndProject / TopKPerKey, ordering inside keys a
  * local window sort). Runs on the static physical plan of every
  * SparkEntry query, so a regression in any operator's join/order shape
  * fails CI before it ships.
  */
class PlanLintSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("no query plans a CartesianProduct or a global Sort") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      val plan = fn(spark, dir).queryExecution.executedPlan
      val cartesian = plan.collect { case c: CartesianProductExec => c }
      val globalSorts = plan.collect { case s: SortExec if s.global => s }
      (if (cartesian.nonEmpty) Seq(s"$name: CartesianProduct") else Nil) ++
        (if (globalSorts.nonEmpty) Seq(s"$name: global Sort") else Nil)
    }
    assert(offenders.isEmpty, s"scale-hostile plan shapes:\n${offenders.mkString("\n")}")
  }
}
