package graft

import graft.operators.{Analytics, Events}

/** Batch event operators over real testdata (sf0.001), including the
  * sketch/exact agreement bound.
  */
class EventsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"

  test("sessionize: session bounds ordered, events conserved") {
    val sessions = Events.sessionize(spark, dir).collect()
    assert(sessions.nonEmpty)
    sessions.foreach { r =>
      assert(r.getAs[Long]("start_sec") <= r.getAs[Long]("end_sec"))
    }
    val total = sessions.map(_.getAs[Long]("n_events")).sum
    assert(total === Graft.events(spark, dir).count())
  }

  test("approx sketches agree with exact aggregates within tolerance") {
    val approx = Analytics.approxStats(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    val exact = Analytics.eventQuantiles(spark, dir).collect()
      .map(r => r.getString(0) -> r).toMap
    assert(approx.keySet === exact.keySet)
    approx.foreach { case (tpe, a) =>
      val p50Approx = a.getAs[Double]("p50")
      val p50Exact = exact(tpe).getAs[Double]("p50")
      assert(math.abs(p50Approx - p50Exact) / p50Exact < 0.05,
        s"$tpe p50 approx $p50Approx vs exact $p50Exact")
      assert(a.getAs[Long]("approx_users") > 0)
    }
  }
}
