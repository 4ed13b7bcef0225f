package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Graft

/** Relational / analytics core: grouped aggregation, multi-way joins with
  * broadcast dims, window top-n. TPC-H-shaped so the DuckDB oracle can
  * cross-check exactly.
  *
  * Scale notes: q1 is fully map-side-combinable; q3/q5 broadcast every
  * dimension small enough and let AQE pick shuffle-join for fact-fact;
  * top-k goes through TakeOrderedAndProject (per-partition heaps, no global
  * sort).
  */
object Relational {
  private val ts = (s: String) => lit(java.sql.Timestamp.valueOf(s + " 00:00:00.0"))

  /** TPC-H Q1-style pricing summary. */
  def q1(s: SparkSession, dir: String): DataFrame =
    Graft.lineitem(s, dir)
      .filter(col("l_shipdate") <= ts("1998-09-01"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("sum_disc_price"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_discount")), 6).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** TPC-H Q3-style: top unshipped-revenue orders for one segment. */
  def q3(s: SparkSession, dir: String): DataFrame = {
    val cust = Graft.customer(s, dir).filter(col("c_mktsegment") === "MACHINERY")
    val ord = Graft.orders(s, dir).filter(col("o_orderdate") < ts("1998-01-01"))
    val li = Graft.lineitem(s, dir).filter(col("l_shipdate") > ts("1998-01-01"))
    // customer is SF-scaled (not a fixed dim): leave the join
    // shuffle-shaped — AQE broadcasts it at runtime when the filtered
    // side measures small, and the plan survives 100 TB unchanged
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"), col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
      .select(
        col("l_orderkey"),
        col("revenue"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("odate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-style: local-supplier revenue per nation in one region/year. */
  def q5(s: SparkSession, dir: String): DataFrame = {
    val ord = Graft.orders(s, dir)
      .filter(col("o_orderdate") >= ts("1996-01-01") && col("o_orderdate") < ts("1997-01-01"))
    // customer/supplier are SF-scaled: AQE-decided joins (see q3)
    Graft.lineitem(s, dir)
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(Graft.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(Graft.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Graft.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Graft.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))), 4).as("revenue"))
  }

  /** Top-3 orders per customer by total price (window rank). */
  def windowTopN(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Graft.orders(s, dir)
      .select(
        col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("price"),
        row_number().over(w).cast("long").as("rn"))
      .filter(col("rn") <= 3)
  }

  /** Exact revenue in $1e-4 units: price_cents * (100 - discount
    * hundredths). Both factors sit on 2dp grids, so this is the exact
    * integer form of extendedprice * (1 - discount) — summable at any
    * scale with zero float drift (long holds ~9e18; div-rescale before
    * any further multiply).
    */
  private val revU = "cast(round(l_extendedprice * 100) as bigint)" +
    " * (100 - cast(round(l_discount * 100) as bigint))"
  private val duckRevU = "CAST(round(l_extendedprice * 100) AS BIGINT)" +
    " * (100 - CAST(round(l_discount * 100) AS BIGINT))"

  /** TPC-H Q8-flavored market share: each customer-nation's share of
    * yearly revenue. Fact-fact join shuffles on orderkey; customer and
    * nation broadcast; the per-year total is a window over the tiny
    * (year x nation) aggregate. Shares are integer micros computed on
    * div-rescaled dollars so the multiply never overflows long.
    */
  def marketShare(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_year"))
    // customer is fact-sized at 100 TB — never explicitly broadcast;
    // AQE converts the custkey join to broadcast when it measures small
    Graft.lineitem(s, dir)
      .join(Graft.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(Graft.customer(s, dir).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .join(broadcast(Graft.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("o_year"),
        col("n_name").as("nation"))
      .agg(sum(expr(revU)).as("revenue_e4"))
      .withColumn("total_e4", sum(col("revenue_e4")).over(w))
      .select(col("o_year"), col("nation"), col("revenue_e4"),
        expr("(revenue_e4 div 10000) * 1000000 div (total_e4 div 10000)").as("share_micros"))
  }

  /** TPC-H Q7-flavored nation traffic: revenue shipped between distinct
    * (customer nation, supplier nation) pairs. One orderkey shuffle;
    * both nation lookups broadcast; the inequality filter lands before
    * the aggregation.
    */
  def nationTraffic(s: SparkSession, dir: String): DataFrame = {
    // per-customer / per-supplier maps are fact-sized at 100 TB: the
    // nation lookup itself broadcasts (25 rows), but the key joins stay
    // shuffle-shaped and AQE downgrades them to broadcast when small
    val custNation = Graft.customer(s, dir)
      .join(broadcast(Graft.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val suppNation = Graft.supplier(s, dir)
      .join(broadcast(Graft.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Graft.lineitem(s, dir)
      .join(Graft.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
      .join(custNation, col("o_custkey") === col("c_custkey"))
      .join(suppNation, col("l_suppkey") === col("s_suppkey"))
      .filter(col("cust_nation") =!= col("supp_nation"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("n_items"), sum(expr(revU)).as("revenue_e4"))
  }

  /** TPC-H Q13-flavored customer distribution: how many customers placed
    * exactly N orders (including zero). LEFT OUTER join so orderless
    * customers survive; two grouped passes, both map-side combinable. The
    * second agg's input is one row per customer — already the small side.
    */
  def custDist(s: SparkSession, dir: String): DataFrame = {
    // customer and orders are both fact-sized: shuffle join on custkey,
    // AQE downgrades to broadcast when the filtered side measures small
    val perCust = Graft.customer(s, dir).select(col("c_custkey"))
      .join(Graft.orders(s, dir).select(col("o_custkey"), col("o_orderkey")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
    perCust.groupBy(col("c_count")).agg(count(lit(1)).as("custdist"))
  }

  /** TPC-H Q14-flavored promo revenue share per ship-month: exact integer
    * revenue ($1e-4 units) with a conditional sum, share in micros via the
    * div-rescale trick (never a float division). One partkey shuffle; the
    * month agg is map-side combinable.
    */
  def promoShare(s: SparkSession, dir: String): DataFrame = {
    // part is SF-scaled: shuffle join, AQE decides broadcast at runtime
    Graft.lineitem(s, dir)
      .join(Graft.part(s, dir).select(col("p_partkey"), col("p_type")),
        col("l_partkey") === col("p_partkey"))
      .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("ship_month"))
      .agg(
        sum(when(col("p_type") === "PROMO", expr(revU)).otherwise(lit(0L))).as("promo_e4"),
        sum(expr(revU)).as("total_e4"))
      .select(col("ship_month"), col("promo_e4"), col("total_e4"),
        // greatest(..,1): a degenerate month with total revenue under $1
        // would divide by zero (NULL in Spark, an ERROR in DuckDB's //);
        // promo <= total means the numerator is 0 whenever the guard fires
        expr("(promo_e4 div 10000) * 1000000 div greatest(total_e4 div 10000, 1)")
          .as("promo_micros"))
  }

  /** TPC-H Q15-flavored top supplier: the supplier(s) with max revenue in
    * one ship-year. No global sort and no driver round-trip: the per-supplier
    * aggregate joins against its own 1-row max() via broadcast — scale-safe
    * even when the supplier aggregate itself is huge.
    */
  def topSupplier(s: SparkSession, dir: String): DataFrame = {
    val rev = Graft.lineitem(s, dir)
      .filter(col("l_shipdate") >= ts("1997-01-01") && col("l_shipdate") < ts("1998-01-01"))
      .groupBy(col("l_suppkey"))
      .agg(sum(expr(revU)).as("total_revenue_e4"))
    val top = rev.agg(max(col("total_revenue_e4")).as("max_rev_e4"))
    rev.join(broadcast(top), col("total_revenue_e4") === col("max_rev_e4"))
      .join(Graft.supplier(s, dir), col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue_e4"))
  }

  val oracle: Map[String, String] = Map(
    "q_cust_dist" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q_promo_share" ->
      s"""SELECT strftime(l_shipdate, '%Y-%m') AS ship_month,
         | CAST(sum(CASE WHEN p_type = 'PROMO' THEN $duckRevU ELSE 0 END) AS BIGINT) AS promo_e4,
         | CAST(sum($duckRevU) AS BIGINT) AS total_e4,
         | (CAST(sum(CASE WHEN p_type = 'PROMO' THEN $duckRevU ELSE 0 END) AS BIGINT) // 10000)
         |   * 1000000 // greatest(CAST(sum($duckRevU) AS BIGINT) // 10000, 1) AS promo_micros
         |FROM lineitem JOIN part ON l_partkey = p_partkey
         |GROUP BY 1""".stripMargin,
    "q_top_supplier" ->
      s"""WITH rev AS (SELECT l_suppkey, CAST(sum($duckRevU) AS BIGINT) AS total_revenue_e4
         | FROM lineitem
         | WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
         |   AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
         | GROUP BY l_suppkey)
         |SELECT s_suppkey, s_name, total_revenue_e4
         |FROM rev JOIN supplier ON l_suppkey = s_suppkey
         |WHERE total_revenue_e4 = (SELECT max(total_revenue_e4) FROM rev)""".stripMargin,
    "q_market_share" ->
      s"""WITH a AS (SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year, n_name AS nation,
         |  CAST(sum($duckRevU) AS BIGINT) AS revenue_e4
         | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |  JOIN customer ON o_custkey = c_custkey
         |  JOIN nation ON c_nationkey = n_nationkey
         | GROUP BY 1, 2),
         |t AS (SELECT *, CAST(sum(revenue_e4) OVER (PARTITION BY o_year) AS BIGINT) AS total_e4
         |      FROM a)
         |SELECT o_year, nation, revenue_e4,
         | (revenue_e4 // 10000) * 1000000 // (total_e4 // 10000) AS share_micros
         |FROM t""".stripMargin,
    "q_nation_traffic" ->
      s"""SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
         | count(*) AS n_items, CAST(sum($duckRevU) AS BIGINT) AS revenue_e4
         |FROM lineitem
         | JOIN orders ON l_orderkey = o_orderkey
         | JOIN customer ON o_custkey = c_custkey
         | JOIN nation cn ON c_nationkey = cn.n_nationkey
         | JOIN supplier ON l_suppkey = s_suppkey
         | JOIN nation sn ON s_nationkey = sn.n_nationkey
         |WHERE cn.n_name != sn.n_name
         |GROUP BY 1, 2""".stripMargin,
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        | round(sum(l_quantity),2) AS sum_qty,
        | round(sum(l_extendedprice),2) AS sum_base_price,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS sum_disc_price,
        | round(avg(l_quantity),4) AS avg_qty,
        | round(avg(l_discount),6) AS avg_disc,
        | count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-01 00:00:00'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join" ->
      """SELECT l_orderkey,
        | round(sum(l_extendedprice*(1-l_discount)),4) AS revenue,
        | strftime(o_orderdate, '%Y-%m-%d') AS odate, o_orderpriority
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        | JOIN customer ON o_custkey=c_custkey
        |WHERE c_mktsegment='MACHINERY'
        | AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
        | AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name, round(sum(l_extendedprice*(1-l_discount)),4) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey=o_orderkey
        | JOIN customer ON o_custkey=c_custkey
        | JOIN supplier ON l_suppkey=s_suppkey AND c_nationkey=s_nationkey
        | JOIN nation ON s_nationkey=n_nationkey
        | JOIN region ON n_regionkey=r_regionkey
        |WHERE r_name='ASIA'
        | AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        | AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
        |GROUP BY n_name""".stripMargin,
    "window_topn" ->
      """SELECT o_custkey, o_orderkey, round(o_totalprice,2) AS price, rn
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |  row_number() OVER (PARTITION BY o_custkey
        |                     ORDER BY o_totalprice DESC, o_orderkey) AS rn
        | FROM orders) WHERE rn <= 3""".stripMargin,
  )
}
