package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.plans.{TopKPerKey, TopKPerKeyExec}

class TopKPerKeySpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  private lazy val df = Seq(
    ("a", 1L, 0.9), ("a", 2L, 0.8), ("a", 3L, 0.95), ("a", 4L, 0.8),
    ("b", 5L, 0.1), ("b", 6L, 0.2),
    ("c", 7L, 0.5),
  ).toDF("key", "id", "score")

  test("TopKPerKey == window rank result") {
    val got = TopKPerKey(df, Seq("key"), Seq(("score", false), ("id", true)), 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val expect = df.withColumn("rn", row_number().over(w)).filter($"rn" <= 2)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expect)
    assert(got === Set(("a", 3L), ("a", 1L), ("b", 6L), ("b", 5L), ("c", 7L)))
  }

  test("plans through TopKPerKeyExec with a clustered exchange") {
    val q = TopKPerKey(df, Seq("key"), Seq(("score", false), ("id", true)), 1)
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"))
  }

  test("partial heap feeds the final merge (map-side combine shape)") {
    // a low-cardinality key must NOT stream its whole slice through one
    // reduce task: the map-side (partial) heap bounds each input
    // partition to <= k rows per key BEFORE the exchange, the final
    // heap merges the survivors under ClusteredDistribution — the
    // hash-aggregation partial/final split for top-k
    val q = TopKPerKey(df.repartition(4, $"id"),
      Seq("key"), Seq(("score", false), ("id", true)), 2)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 3L), ("a", 1L), ("b", 6L), ("b", 5L), ("c", 7L)))
    val plan = q.queryExecution.executedPlan
    val heaps = collectWithSubqueries(plan) { case t: TopKPerKeyExec => t }
    val finals = heaps.filter(!_.partial)
    assert(finals.nonEmpty && heaps.exists(_.partial),
      s"expected a partial AND a final TopKPerKey stage:\n$plan")
    finals.foreach { f =>
      val partialBelow = collectWithSubqueries(f.child) {
        case t: TopKPerKeyExec if t.partial => t
      }
      assert(partialBelow.nonEmpty,
        s"final heap not fed by a partial (unbounded per-key stream):\n$plan")
    }
  }

  test("tie-break makes equal scores deterministic") {
    val got = TopKPerKey(df, Seq("key"), Seq(("score", false), ("id", true)), 3)
      .filter($"key" === "a").collect().map(_.getLong(1)).toSet
    assert(got === Set(3L, 1L, 2L)) // 2 beats 4 on the id tie-break at 0.8
  }

  test("optimizer rule rewrites rank<=k filters that drop the rank") {
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val q = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"key", $"id", $"score") // rn dropped -> rewrite applies
    q.collect()
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("TopKPerKey"), s"expected TopKPerKeyExec:\n$plan")
    assert(!plan.contains("Window"), s"window must be eliminated:\n$plan")
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 3L), ("a", 1L), ("b", 6L), ("b", 5L), ("c", 7L)))
  }

  test("optimizer rule also matches rank = 1 and cast(rank as long)") {
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val q1 = df.withColumn("rn", row_number().over(w))
      .filter($"rn" === 1).select($"key", $"id")
    assert(q1.queryExecution.executedPlan.toString.contains("TopKPerKey"))
    assert(q1.collect().map(r => (r.getString(0), r.getLong(1))).toSet ===
      Set(("a", 3L), ("b", 6L), ("c", 7L)))
    val q2 = df.withColumn("rn", row_number().over(w).cast("long"))
      .filter($"rn" <= 2L).select($"key", $"id")
    assert(q2.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      q2.queryExecution.executedPlan.toString)
  }

  test("optimizer rule fires for plain SQL window queries too") {
    df.createOrReplaceTempView("topk_rule_sql_t")
    val q = spark.sql(
      """SELECT key, id, score FROM (
        |  SELECT *, row_number() OVER (PARTITION BY key ORDER BY score DESC, id) AS rn
        |  FROM topk_rule_sql_t) WHERE rn <= 2""".stripMargin)
    assert(q.queryExecution.executedPlan.toString.contains("TopKPerKey"),
      q.queryExecution.executedPlan.toString)
    val got = q.collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("a", 3L), ("a", 1L), ("b", 6L), ("b", 5L), ("c", 7L)))
  }

  test("two-stage heap keeps wall-time flat when key cardinality collapses to 2") {
    // the straggler the partial/final split exists to kill, as a MEASURED
    // guarantee rather than a plan-shape argument: with a final-only heap,
    // 2 keys funnel ~N/2 raw rows through each of 2 reduce tasks while 31
    // of 32 cores idle; with the map-side partial stage the exchange
    // carries <= k rows per key per input partition, so the 2-key run
    // costs the same scan as the 1000-key run. Same rows, same k, only
    // |keys| varies. Min-of-2 per shape absorbs scheduling wobble; the
    // 3x bound is generous (a final-only regression measures >> 5x here
    // while genuine noise stays well under 2x).
    import org.apache.spark.sql.functions.{col, expr}
    val n = 4L * 1000 * 1000
    def run(keyMod: Long): Double = {
      val base = spark.range(n).select(
        (col("id") % keyMod).as("k"),
        expr("(id * 2654435761) % 1000003").as("v"),
        col("id"))
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.plans.TopKPerKey(base, Seq("k"), Seq(("v", true), ("id", true)), 5).count()
        (System.nanoTime() - t0) / 1e9
      }
      times.min
    }
    run(1000) // JVM/codegen warmup, untimed
    val wide = run(1000)
    val collapsed = run(2)
    info(f"1000 keys: $wide%.2fs; 2 keys: $collapsed%.2fs")
    assert(collapsed <= math.max(3.0 * wide, wide + 2.0),
      f"2-key top-k took $collapsed%.2fs vs $wide%.2fs for 1000 keys - " +
        "the partial heap stage is no longer bounding per-key fan-in before the exchange")
  }

  test("optimizer rule leaves queries that keep the rank untouched") {
    val w = Window.partitionBy($"key").orderBy($"score".desc, $"id")
    val q = df.withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .select($"key", $"id", $"rn") // rn kept -> must stay a Window
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("Window") || plan.contains("WindowGroupLimit"), plan)
    assert(!plan.contains("TopKPerKey"), plan)
  }
}
