package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.SortExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Plan lint over the ENTIRE query inventory: no operator may plan a
  * Cartesian product (both sides unbounded — the accidental-cross-join
  * scale killer) or a global sort (single-partition ordering; top-k
  * must be TakeOrderedAndProject / TopKPerKey, ordering inside keys a
  * local window sort). Runs on the static physical plan of every
  * SparkEntry query, so a regression in any operator's join/order shape
  * fails CI before it ships.
  *
  * AQE wraps every plan with an exchange in AdaptiveSparkPlanExec — a
  * leaf to plain `plan.collect` — so the lint traverses with
  * AdaptiveSparkPlanHelper.collectWithSubqueries (which descends into
  * adaptive plans AND subquery plans); two canary tests prove the lint
  * actually fires on deliberately bad plans under AQE.
  */
class PlanLintSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  private val dir = "/root/testdata/sf0.001"

  private def offenses(df: DataFrame): Seq[String] = {
    val plan = df.queryExecution.executedPlan
    val cartesian = collectWithSubqueries(plan) { case c: CartesianProductExec => c }
    val globalSorts = collectWithSubqueries(plan) { case s: SortExec if s.global => s }
    (if (cartesian.nonEmpty) Seq("CartesianProduct") else Nil) ++
      (if (globalSorts.nonEmpty) Seq("global Sort") else Nil)
  }

  test("canary: the lint catches a deliberate CartesianProduct under AQE") {
    import spark.implicits._
    // disable auto-broadcast so the cross join can't degrade to a
    // BroadcastNestedLoopJoin (tiny test frames always fit the threshold)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val big = spark.range(1000).toDF("a")
      val alsoBig = spark.range(1000).toDF("b")
      val bad = big.crossJoin(alsoBig).filter($"a" + $"b" > 0)
      assert(offenses(bad).contains("CartesianProduct"),
        s"lint is vacuous: missed a cross join in\n${bad.queryExecution.executedPlan}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("canary: the lint catches a deliberate global Sort under AQE") {
    import spark.implicits._
    // groupBy forces an exchange so AQE wraps the plan; orderBy without
    // a limit plans a global SortExec above it
    val bad = spark.range(1000).toDF("a").groupBy($"a" % 7).count().orderBy($"count")
    assert(offenses(bad).contains("global Sort"),
      s"lint is vacuous: missed a global sort in\n${bad.queryExecution.executedPlan}")
  }

  test("no query plans a CartesianProduct or a global Sort") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      offenses(fn(spark, dir)).map(o => s"$name: $o")
    }
    assert(offenders.isEmpty, s"scale-hostile plan shapes:\n${offenders.mkString("\n")}")
  }
}
