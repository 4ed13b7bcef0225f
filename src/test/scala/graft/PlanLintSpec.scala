package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.physical.SinglePartition
import org.apache.spark.sql.execution.{SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.columnar.InMemoryTableScanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.CartesianProductExec
import org.apache.spark.sql.execution.window.WindowExec

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

  /** The linted plan plus, transitively, every cached subplan: an operator
    * that persist()s an intermediate (pagerank's edge/degree frames) shows
    * an InMemoryTableScanExec leaf whose relation.cachedPlan is the real
    * physical subtree — collectWithSubqueries does not descend into it, so
    * without this expansion a persisted query would be exempt from the lint.
    */
  private def withCachedPlans(plan: SparkPlan): Seq[SparkPlan] = {
    val cached = collectWithSubqueries(plan) { case s: InMemoryTableScanExec =>
      s.relation.cachedPlan
    }
    plan +: cached.flatMap(withCachedPlans)
  }

  /** True when `p` (descending through at most a local Sort) is a shuffle
    * that gathers EVERYTHING onto one partition. This is the plan shape an
    * unpartitioned ranking window leaves: Window <- Sort(local) <-
    * Exchange(SinglePartition) — the sort is local so the `global Sort`
    * lint never fires, but one task still sorts the whole input. The
    * legitimate bounded twin (orderBy.limit(n) then rank) plans
    * TakeOrderedAndProject, whose output is already SinglePartition
    * WITHOUT an exchange node, so it does not trip this.
    */
  private def gathersAllRows(p: SparkPlan): Boolean = p match {
    case s: SortExec => gathersAllRows(s.child)
    case e: ShuffleExchangeExec => e.outputPartitioning == SinglePartition
    case _ => false
  }

  private def offenses(df: DataFrame): Seq[String] = {
    val plans = withCachedPlans(df.queryExecution.executedPlan)
    val cartesian = plans.flatMap(p =>
      collectWithSubqueries(p) { case c: CartesianProductExec => c })
    val globalSorts = plans.flatMap(p =>
      collectWithSubqueries(p) { case s: SortExec if s.global => s })
    val singlePartRank = plans.flatMap(p =>
      collectWithSubqueries(p) {
        case w: WindowExec if gathersAllRows(w.child) => w
        case s: SortExec if !s.global && gathersAllRows(s.child) => s
      })
    (if (cartesian.nonEmpty) Seq("CartesianProduct") else Nil) ++
      (if (globalSorts.nonEmpty) Seq("global Sort") else Nil) ++
      (if (singlePartRank.nonEmpty) Seq("SinglePartition exchange feeding Window/Sort") else Nil)
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

  test("canary: the lint catches an unpartitioned ranking window (SinglePartition exchange)") {
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.row_number
    // the round-6 hybrid_rrf shape: rank EVERY group with no partitionBy —
    // a local Sort under Exchange(SinglePartition), invisible to the
    // global-Sort lint
    val bad = spark.range(1000).toDF("a").groupBy($"a" % 7).count()
      .withColumn("r", row_number().over(Window.orderBy($"count".desc)))
    assert(offenses(bad).contains("SinglePartition exchange feeding Window/Sort"),
      s"lint is vacuous: missed an unpartitioned window in\n${bad.queryExecution.executedPlan}")
    // ...while the bounded twin (top-n first, then rank within <= n rows)
    // stays green: TakeOrderedAndProject needs no exchange
    val good = spark.range(1000).toDF("a").groupBy($"a" % 7).count()
      .orderBy($"count".desc).limit(10)
      .withColumn("r", row_number().over(Window.orderBy($"count".desc)))
    assert(!offenses(good).contains("SinglePartition exchange feeding Window/Sort"),
      s"lint over-fires on a bounded ranking:\n${good.queryExecution.executedPlan}")
  }

  test("canary: the lint descends into persisted (InMemoryRelation) subplans") {
    import spark.implicits._
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val bad = spark.range(1000).toDF("a")
      .crossJoin(spark.range(1000).toDF("b")).filter($"a" + $"b" > 0)
      .persist()
    try {
      // downstream of the cache the visible plan is just an
      // InMemoryTableScan — the offense hides in relation.cachedPlan
      val downstream = bad.groupBy($"a").count()
      assert(offenses(downstream).contains("CartesianProduct"),
        s"lint is blind to cached subplans:\n${downstream.queryExecution.executedPlan}")
    } finally {
      bad.unpersist()
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    }
  }

  test("no query plans a CartesianProduct or a global Sort") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      offenses(fn(spark, dir)).map(o => s"$name: $o")
    }
    assert(offenders.isEmpty, s"scale-hostile plan shapes:\n${offenders.mkString("\n")}")
  }
}
