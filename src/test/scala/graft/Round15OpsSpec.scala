package graft

import org.apache.spark.sql.functions._
import graft.operators.Ann

/** Round-15 depth work: the serving walk's Q-routed execution. The beam
  * rounds have two physical shapes — driver-ranked state for a small
  * serving request, fully distributed rounds for a batch-serving job —
  * and they must be VALUE-IDENTICAL: same scoring expression, same
  * (score desc, node) total order, same distinct-then-cut semantics.
  * Routing changes the plan, never the result.
  */
class Round15OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  private def servingParts(): (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    val undE = Ann.graphSearchIndex(spark, dir)
    val cents = Graft.embeddings(spark, dir)
      .filter(col("vec_id") < Ann.sqrtFanout(Graft.tableRows(spark, dir, "embeddings")))
      .select(col("vec_id").as("node"), col("embedding").as("nv"))
    (undE, cents)
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[(Long, Long, Long, Double)] =
    df.select("q_id", "rn", "vec_id", "score").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .sortBy(t => (t._1, t._2)).toSeq

  test("routed beam search: distributed rounds equal the driver-ranked path") {
    val (undE, cents) = servingParts()
    // a batch bigger than the keyed 20-query request: every 7th vector
    // (residue 3), 60 queries — large enough that the distributed path
    // does real multi-partition work, small enough to stay a unit test
    val queries = Graft.embeddings(spark, dir)
      .filter(pmod(col("vec_id"), lit(7L)) === 3L)
      .orderBy(col("vec_id")).limit(60)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val driver = rows(Ann.beamSearchBatch(spark, undE, cents, queries, 4, 32, 8,
      distThreshold = Int.MaxValue))
    val dist = rows(Ann.beamSearchBatch(spark, undE, cents, queries, 4, 32, 8,
      distThreshold = 0))
    assert(driver.nonEmpty)
    assert(dist === driver,
      "distributed beam rounds diverged from the driver-ranked walk")
    // the router itself: at the default threshold this 60-query batch
    // takes the driver path (60 <= 256) and still produces the same rows
    val routed = rows(Ann.beamSearchBatch(spark, undE, cents, queries, 4, 32, 8))
    assert(routed === driver)
    info(s"${driver.map(_._1).distinct.size} queries, ${driver.size} result rows, paths identical")
  }

  test("routed beam search: keyed 20-query batch is path-independent too") {
    val (undE, cents) = servingParts()
    val queries = Graft.embeddings(spark, dir)
      .filter(pmod(col("vec_id"), lit(25L)) === 7L)
      .orderBy(col("vec_id")).limit(Ann.GraphSearchQueryCount)
      .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
    val driver = rows(Ann.beamSearchBatch(spark, undE, cents, queries, 4, 32, 8,
      distThreshold = Int.MaxValue))
    val dist = rows(Ann.beamSearchBatch(spark, undE, cents, queries, 4, 32, 8,
      distThreshold = 0))
    assert(dist === driver)
    // and the keyed operator (which routes internally) agrees with both
    val keyed = rows(Ann.graphSearch(spark, dir))
    assert(keyed === driver)
  }
}
