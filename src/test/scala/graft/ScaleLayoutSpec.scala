package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Storage-layout evidence for the 100 TB design: bucketed tables make
  * the dedup/ANN self-joins shuffle-free, partitioned tables prune at
  * the scan. These are the write-time layouts a production deployment
  * of this engine would use (SURVEY.md §5).
  */
class ScaleLayoutSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("bucketed-by-label embeddings join without a shuffle") {
    spark.sql("DROP TABLE IF EXISTS emb_bucketed")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "emb_bucketed")
    if (loc.exists()) {
      loc.listFiles().foreach(_.delete()); loc.delete()
    }
    val emb = (0L until 200L).map(i => (i, Array.fill(4)(i.toFloat), (i % 10).toInt))
      .toDF("vec_id", "embedding", "label")
    emb.write.mode("overwrite").bucketBy(8, "label").sortBy("label")
      .saveAsTable("emb_bucketed")

    val t = spark.table("emb_bucketed")
    val joined = t.as("a").join(t.as("b"),
      $"a.label" === $"b.label" && $"a.vec_id" < $"b.vec_id")
    joined.count()
    val plan = joined.queryExecution.executedPlan
    val exchanges = collectWithSubqueries(plan) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    }
    assert(exchanges.isEmpty,
      s"bucketed self-join must not shuffle, found: $exchanges")
  }

  test("date-partitioned events prune partitions at the scan") {
    val dir = Files.createTempDirectory("graft-partitioned").toString
    val ev = (0 until 1000).map { i =>
      (i.toLong, 1704067200L + i * 3600L,
        java.time.LocalDate.ofEpochDay(19723L + i % 20).toString)
    }.toDF("event_id", "sec", "day")
    ev.write.mode("overwrite").partitionBy("day").parquet(dir)

    val q = spark.read.parquet(dir).filter($"day" === "2024-01-05")
    q.count()
    val scans = q.queryExecution.executedPlan.collect {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val parts = scans.head.relation.location.listFiles(scans.head.partitionFilters, Nil)
    assert(parts.length === 1, s"expected 1 pruned partition, got ${parts.length}")
  }

  test("dedup self-join computes the shingle kernel subtree once") {
    // Both self-join sides must read one materialization of the kernel+
    // explode pass: either the memoized shingle cache (InMemoryTableScan
    // on both sides — the kernel ran once to populate it) or, without a
    // cache, AQE's ReusedExchange over the identical shuffled subtree.
    val jp = graft.operators.Dedup.jaccardPrefix(spark, "/root/testdata/sf0.001")
    jp.collect()
    val plan = jp.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange") || plan.contains("InMemoryTableScan"),
      s"expected ReusedExchange or a cached shingle scan in the final plan:\n$plan")
  }

  test("nsw graph's per-cell heap consumes the pair join without an exchange") {
    // the full candidate stream (the only frame that grows as N^1.5)
    // must flow join -> bounded heap directly: TopKPerKeyExec's
    // ClusteredDistribution(src, cid) is satisfied by the join's
    // hash(cid) partitioning, so any ShuffleExchange between them is a
    // plan regression that re-materializes 100M+ rows at scale
    val g = graft.operators.Ann.nswGraph(spark, "/root/testdata/sf0.001")
    g.collect()
    val plan = g.queryExecution.executedPlan
    val heaps = collectWithSubqueries(plan) {
      case t: graft.plans.TopKPerKeyExec if t.keys.length == 2 => t
    }
    assert(heaps.nonEmpty, s"per-(src,cid) TopKPerKey missing:\n$plan")
    val exchangesBelow = heaps.flatMap(h => collectWithSubqueries(h.child) {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeLike => e
    })
    // the join's own two cid exchanges sit BELOW the join; none may sit
    // between the join output and the heap — i.e. the heap's child
    // subtree contains exactly the join's input exchanges (2), not 3
    assert(exchangesBelow.length <= 2,
      s"extra exchange between pair join and per-cell heap:\n$plan")
  }

  test("set-ops query computes each distinct subtree once (ReusedExchange)") {
    // q_set_ops references the click/purchase distinct subtrees from all
    // three set operators; every branch shuffles the same canonical
    // subtree on user_id, so the executed plan must resolve the repeats
    // as ReusedExchange — a regression to six scans of the distinct
    // subtrees would show up as a plan with none.
    val so = graft.operators.Analytics.userSetOps(spark, "/root/testdata/sf0.001")
    so.collect()
    val plan = so.queryExecution.executedPlan.toString
    assert(plan.contains("ReusedExchange"),
      s"expected ReusedExchange in the executed set-ops plan:\n$plan")
  }
}
