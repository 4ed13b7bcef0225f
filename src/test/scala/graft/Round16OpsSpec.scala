package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Round-16 depth work: Q-routed execution for the REMAINING serving
  * walks. Round 15 gave the flat float walk two value-identical
  * physical shapes (driver-ranked vs fully distributed) behind a
  * query-count dispatch; the filtered, int8-quantized and layered-HNSW
  * walks kept unconditional driver-side beam state. These specs assert
  * the same contract for each variant: routing changes the plan, never
  * the result — same scoring expression, same (score desc, node) total
  * order, same distinct-then-cut rounds on both paths.
  */
class Round16OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  // a batch bigger than the keyed 20-query request: every 7th vector
  // (residue 3), 60 queries — enough for real multi-partition work on
  // the distributed path, small enough for a unit test
  private def queries60() = Graft.embeddings(spark, dir)
    .filter(pmod(col("vec_id"), lit(7L)) === 3L)
    .orderBy(col("vec_id")).limit(60)
    .select(col("vec_id").as("q_id"), col("embedding").as("qv"))

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("q_id", "rn", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("routed FILTERED walk: distributed dual-state rounds equal the driver path") {
    val queries = queries60()
    // id-residue filter at 20% selectivity — the curve's densest point,
    // so both the navigation beam (adaptive ef) and the result
    // accumulator see non-trivial traffic every round
    val driver = rows(Ann.graphSearchFilteredBatch(spark, dir, queries, 4, 32, 8,
      byId = true, 5L, 2L, distThreshold = Int.MaxValue))
    val dist = rows(Ann.graphSearchFilteredBatch(spark, dir, queries, 4, 32, 8,
      byId = true, 5L, 2L, distThreshold = 0))
    assert(driver.nonEmpty)
    assert(dist === driver,
      "distributed filtered rounds diverged from the driver-ranked walk")
    // every returned node passes the filter on both paths
    assert(driver.forall(_._3 % 5L == 2L))
    // router default: 60 <= GraphSearchDistQ keeps the driver path
    val routed = rows(Ann.graphSearchFilteredBatch(spark, dir, queries, 4, 32, 8,
      byId = true, 5L, 2L))
    assert(routed === driver)
    info(s"${driver.map(_._1).distinct.size} queries, ${driver.size} filtered rows, paths identical")
  }

  test("routed INT8 walk: distributed quantized rounds equal the driver path") {
    val queries = queries60()
    val driver = rows(Ann.graphSearchInt8Batch(spark, dir, queries, 4, 32, 8,
      distThreshold = Int.MaxValue))
    val dist = rows(Ann.graphSearchInt8Batch(spark, dir, queries, 4, 32, 8,
      distThreshold = 0))
    assert(driver.nonEmpty)
    assert(dist === driver,
      "distributed int8 rounds diverged from the driver-ranked walk")
    val routed = rows(Ann.graphSearchInt8Batch(spark, dir, queries, 4, 32, 8))
    assert(routed === driver)
    info(s"${driver.map(_._1).distinct.size} queries, ${driver.size} rows, paths identical")
  }

  test("routed LAYERED HNSW walk: distributed descent equals the driver path") {
    val queries = queries60()
    val edges = Ann.hnswGraph(spark, dir)
    val driver = rows(Ann.hnswSearchBatch(spark, dir, edges, "hnsw_search_index",
      queries, 4, 32, 8, distThreshold = Int.MaxValue))
    val dist = rows(Ann.hnswSearchBatch(spark, dir, edges, "hnsw_search_index",
      queries, 4, 32, 8, distThreshold = 0))
    assert(driver.nonEmpty)
    assert(dist === driver,
      "distributed layered descent diverged from the driver-ranked walk")
    val routed = rows(Ann.hnswSearchBatch(spark, dir, edges, "hnsw_search_index",
      queries, 4, 32, 8))
    assert(routed === driver)
    info(s"${driver.map(_._1).distinct.size} queries, ${driver.size} rows, paths identical")
  }

  test("layered search off the written generation equals the live walk (read-equivalence)") {
    val live = rows(Ann.hnswSearch(spark, dir))
    val fromGen = rows(Ann.hnswSearchFromGen(spark, dir))
    assert(live.nonEmpty)
    assert(fromGen === live,
      "written-generation layered serving diverged from the live hierarchy")
  }

  test("the merged insert generation serves through BOTH routed paths identically") {
    // r15 built the layered insert; r16 routed the layered walk — the
    // composition: a post-insert generation served by the distributed
    // rounds must equal the driver descent over the same merged edges
    val merged = Ann.hnswGraphInsert(spark, dir)
      .select(col("layer"), col("src"), col("dst"))
    val queries = queries60()
    val driver = rows(Ann.hnswSearchBatch(spark, dir, merged, "hnsw_merge_serve_r16",
      queries, 4, 32, 8, distThreshold = Int.MaxValue))
    val dist = rows(Ann.hnswSearchBatch(spark, dir, merged, "hnsw_merge_serve_r16",
      queries, 4, 32, 8, distThreshold = 0))
    assert(driver.nonEmpty)
    assert(dist === driver,
      "distributed descent over the merged insert generation diverged from the driver path")
  }

  test("keyed entries still ride the driver path and match the batch router") {
    // the keyed Q=20 queries must be untouched by the refactor: the
    // public entry (driver core, no count job) equals the routed batch
    // form fed the same batch
    val keyedQs = Graft.embeddings(spark, dir)
      .filter(pmod(col("vec_id"), lit(25L)) === 7L)
      .orderBy(col("vec_id")).limit(20)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val pub = rows(Ann.graphSearchInt8(spark, dir))
    val batch = rows(Ann.graphSearchInt8Batch(spark, dir, keyedQs, 4, 32, 8))
    assert(pub === batch)
    val pubF = rows(Ann.graphSearchFiltered(spark, dir))
    val batchF = rows(Ann.graphSearchFilteredBatch(spark, dir, keyedQs, 4, 32, 8,
      byId = false, Ann.GraphSearchFilterMod, Ann.GraphSearchFilterRes))
    assert(pubF === batchF)
  }
}
