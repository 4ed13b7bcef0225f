package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Partial}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, SortMergeJoinExec}

/** Positive plan evidence for the §4 claims the lint can't express as
  * bans: predicates REACH the parquet scan (PushedFilters), projections
  * PRUNE the scan schema (ReadSchema), dimension joins BROADCAST, and
  * aggregations run map-side partials before the exchange. Each test
  * pins a representative query's physical plan; the no-filter canary
  * keeps the pushdown helper non-vacuous.
  */
class PlanEvidenceSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  private val dir = "/root/testdata/sf0.001"

  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }

  private def pushedFilters(s: FileSourceScanExec): String =
    s.metadata.getOrElse("PushedFilters", "[]")

  test("q6_forecast's lineitem predicates are pushed into the parquet scan") {
    val li = scans(SparkEntry.queries("q6_forecast")(spark, dir))
      .filter(_.metadata.get("Location").exists(_.contains("lineitem")))
    assert(li.nonEmpty, "no lineitem scan found")
    val pushed = li.map(pushedFilters).mkString
    // the discount bound compares a ROUNDED expression, which correctly
    // cannot push; the plain column-vs-literal predicates must
    Seq("GreaterThanOrEqual(l_shipdate", "LessThan(l_shipdate",
      "LessThan(l_quantity").foreach(c =>
      assert(pushed.contains(c),
        s"predicate $c not pushed to the scan: $pushed"))
  }

  test("canary: a filterless scan reports no pushed filters") {
    val all = scans(Graft.lineitem(spark, dir))
    assert(all.nonEmpty && all.forall(s => pushedFilters(s) == "[]"),
      s"pushdown helper is vacuous: ${all.map(pushedFilters)}")
  }

  test("q1_agg prunes the lineitem scan to the columns it needs") {
    val li = scans(SparkEntry.queries("q1_agg")(spark, dir))
      .filter(_.metadata.get("Location").exists(_.contains("lineitem")))
    assert(li.nonEmpty, "no lineitem scan found")
    val read = li.head.requiredSchema.fieldNames.toSet
    val full = Graft.lineitem(spark, dir).schema.fieldNames.toSet
    assert(read.size < full.size, s"no pruning: scan reads all of $read")
    Seq("l_orderkey", "l_partkey", "l_suppkey").foreach(c =>
      assert(!read.contains(c), s"unneeded key column $c not pruned: $read"))
  }

  test("q5_multijoin broadcasts its dimension tables instead of shuffling them") {
    val plan = SparkEntry.queries("q5_multijoin")(spark, dir)
    val bhj = collectWithSubqueries(plan.queryExecution.executedPlan) {
      case j: BroadcastHashJoinExec => j
    }
    assert(bhj.size >= 2,
      s"expected >=2 broadcast joins for region/nation dims:\n${plan.queryExecution.executedPlan}")
    // no dim should fall back to a sort-merge join at this size
    val smjOnDims = collectWithSubqueries(plan.queryExecution.executedPlan) {
      case j: SortMergeJoinExec
          if j.toString.contains("n_nationkey") || j.toString.contains("r_regionkey") => j
    }
    assert(smjOnDims.isEmpty, "a dimension join planned as sort-merge")
  }

  test("q1_agg runs map-side partial aggregation below the exchange") {
    val plan = SparkEntry.queries("q1_agg")(spark, dir).queryExecution.executedPlan
    val partials = collectWithSubqueries(plan) {
      case a: BaseAggregateExec
          if a.aggregateExpressions.exists(_.mode == Partial) => a
    }
    assert(partials.nonEmpty, s"no partial aggregate in:\n$plan")
  }
}
