package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.SortMergeJoinExec
import org.apache.spark.sql.functions._

/** Evidence behind SURVEY §4's "skew handled by AQE skew-join" claim:
  * a deliberately hot join key (one LSH band bucket holding ~100x the
  * mass of its peers — the viral-duplicate shape a near-dup corpus
  * produces) must actually activate Spark's runtime skewed-partition
  * split, and the write-side remedy the dedup operators use (salting
  * the hot key before a shuffle) must spread the same mass so evenly
  * that no split is needed. Thresholds are lowered to make the 200k-row
  * test frame "skewed" by AQE's definition; the CONFIG is test-local,
  * the mechanism is exactly what runs at 100 TB.
  */
class SkewSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private def withSkewConfs[T](body: => T): T = {
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force a shuffle join
      // the unsalted hot partition is ~3 MB, the salted twin's largest
      // is ~100 KB — 512k separates them so ONLY the true hot spot trips
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "512k",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "256k",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      // coalescing can merge away the small partitions the skew test
      // needs as its median reference — pin it off for determinism
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prev = keys.map { case (k, _) => k -> spark.conf.getOption(k) }
    keys.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  /** LSH-band-shaped pair frame: (band, doc) rows where band 0 is a
    * viral bucket holding `hot` docs and bands 1..`cold` hold one doc
    * each — joined to a per-band payload side, the shape of every
    * banded candidate join in Dedup.scala.
    */
  private def bandFrames(hot: Int, cold: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val docs = spark.range(hot).select(lit(0L).as("band"), col("id").as("doc"))
      .union(spark.range(cold).select((col("id") + 1).as("band"), col("id").as("doc")))
    val payload = spark.range(cold + 1).select(col("id").as("pband"),
      concat(lit("payload-"), col("id")).as("info"))
    (docs, payload)
  }

  private def skewJoins(df: DataFrame): Seq[SortMergeJoinExec] = {
    // run THIS queryExecution's plan (df.count() would build a separate
    // aggregate plan and leave this one isFinalPlan=false)
    df.queryExecution.executedPlan.execute().count()
    collectWithSubqueries(df.queryExecution.executedPlan) {
      case s: SortMergeJoinExec if s.isSkewJoin => s
    }
  }

  test("a hot band key activates AQE's skewed-partition split") {
    withSkewConfs {
      val (docs, payload) = bandFrames(hot = 200000, cold = 200)
      val joined = docs.join(payload, col("band") === col("pband"))
      assert(skewJoins(joined).nonEmpty,
        s"AQE skew-join did not activate on a 1000x-hot key:\n" +
          s"${joined.queryExecution.executedPlan}")
    }
  }

  test("salting the hot key spreads the mass — no skew split needed") {
    withSkewConfs {
      val (docs, payload) = bandFrames(hot = 200000, cold = 200)
      // the dedup-side remedy: explode the payload row across 64 salt
      // values and shuffle on (band, salt) — every partition's share of
      // the hot band drops 64x, below the skew threshold
      val salted = docs
        .withColumn("salt", pmod(hash(col("doc")), lit(64)))
        .join(payload.withColumn("psalt", explode(sequence(lit(0), lit(63)))),
          col("band") === col("pband") && col("salt") === col("psalt"))
      assert(skewJoins(salted).isEmpty,
        "the salted twin still skews — salting is not spreading the hot key")
      assert(salted.count() === 200000L + 200L, "salting changed join semantics")
    }
  }
}
