package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}

/** Minimal accessor for Dataset.ofRows (private[sql]) so graft's custom
  * logical plans can be wrapped back into a DataFrame. Lives under
  * org.apache.spark.sql by necessity; contains no Spark internals
  * beyond the one forwarder.
  */
object Bridge {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    ClassicDataset.ofRows(spark.asInstanceOf[ClassicSparkSession], plan)

  /** Block until the live listener bus has delivered every queued event
    * (private[spark]) — a deterministic drain for measurement listeners
    * (shuffle-byte tallies) instead of a race-prone fixed sleep.
    */
  def drainListenerBus(sc: org.apache.spark.SparkContext): Unit =
    sc.listenerBus.waitUntilEmpty()
}
