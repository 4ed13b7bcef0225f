package graft

import org.apache.spark.sql.functions._
import graft.operators.Relational

/** Round-4 operators. Semantics on constructed micro-tables where the
  * contract is subtle; invariants on real sf0.001.
  */
class Round4OpsSpec extends SparkSpec {
  private val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  test("custDist: zero-order customers counted, distribution sums to all customers") {
    val rows = Relational.custDist(spark, dir).collect()
    val nCust = Graft.customer(spark, dir).count()
    assert(rows.map(_.getAs[Long]("custdist")).sum === nCust)
    // testdata has more customers than orders' distinct custkeys → some c_count=0
    val nWithOrders = Graft.orders(spark, dir).select("o_custkey").distinct().count()
    if (nWithOrders < nCust) {
      val zero = rows.find(_.getAs[Long]("c_count") == 0L)
      assert(zero.isDefined && zero.get.getAs[Long]("custdist") === nCust - nWithOrders)
    }
  }

  test("promoShare: share micros bounded, promo never exceeds total") {
    val rows = Relational.promoShare(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val promo = r.getAs[Long]("promo_e4")
      val total = r.getAs[Long]("total_e4")
      val m = r.getAs[Long]("promo_micros")
      assert(promo >= 0L && promo <= total)
      assert(m >= 0L && m <= 1000000L)
    }
  }

  test("topSupplier: returned revenue equals the true max over the year") {
    val got = Relational.topSupplier(spark, dir).collect()
    assert(got.nonEmpty)
    val revs = got.map(_.getAs[Long]("total_revenue_e4")).distinct
    assert(revs.length === 1) // all ties share the max revenue
    // recompute the max independently
    val li = Graft.lineitem(spark, dir)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .groupBy("l_suppkey")
      .agg(sum(expr("cast(round(l_extendedprice * 100) as bigint)" +
        " * (100 - cast(round(l_discount * 100) as bigint))")).as("rev"))
      .agg(max("rev")).first().getLong(0)
    assert(revs.head === li)
  }
}
