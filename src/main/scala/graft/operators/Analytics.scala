package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Graft

/** Second wave of relational/analytics operators: rollup grouping sets,
  * exact quantiles, anti-join, global top-k tokens, ordered-sequence
  * funnel. All partial-agg friendly or broadcast-pruned; nothing
  * collects to the driver.
  */
object Analytics {

  /** Revenue rollup over (region, nation): grouping-set aggregation with
    * map-side partials; null grouping keys rendered as 'ALL' so both
    * engines emit identical rows.
    */
  def rollupRevenue(s: SparkSession, dir: String): DataFrame =
    Graft.customer(s, dir)
      .join(broadcast(Graft.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Graft.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("sum_bal"))

  /** Custom GROUPING SETS ((region), (nation)) — the two marginal
    * aggregations in one Expand pass, without the cross-combinations
    * CUBE would add or ROLLUP's hierarchy; completes the grouping trio
    * with [[rollupRevenue]] and [[cubeOrders]].
    */
  def groupingSetsRevenue(s: SparkSession, dir: String): DataFrame =
    Graft.customer(s, dir)
      .join(broadcast(Graft.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Graft.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupingSets(Seq(Seq(col("r_name")), Seq(col("n_name"))),
        col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), round(sum(col("c_acctbal")), 2).as("sum_bal"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("n_cust"), col("sum_bal"))

  /** Exact per-type percentiles of event value (interpolated, the
    * quantile_cont contract), via the histogram-cumsum shape proved on
    * [[Relational.shipDelayPercentiles]]: `value` is two-decimal
    * currency, so the (type, cents) histogram loses nothing — the
    * groupBy is map-side combinable (each task reduces to <= |types| x
    * distinct-cents partial rows before the exchange) and the rank
    * picks + linear interpolation run over that tiny aggregated frame.
    * The former `percentile()` formulation buffered every raw value of
    * a type inside one aggregation buffer — ~N/|types| doubles on one
    * task at 100 TB. Interpolation reproduces percentile()'s arithmetic
    * order bit-exactly ((hi-pos)*vLo + (pos-lo)*vHi; the lower value
    * when the position lands on an integer), so the DuckDB
    * quantile_cont oracle hash-matches unchanged. Assumes `value` is
    * non-null (true of the events table): rank positions count only
    * non-null values, so nulls would need filtering before the
    * histogram.
    */
  def eventQuantiles(s: SparkSession, dir: String): DataFrame = {
    val byType = org.apache.spark.sql.expressions.Window.partitionBy(col("event_type"))
    val hist = Graft.events(s, dir)
      .select(col("event_type"), expr("cast(round(value * 100) as bigint)").as("cents"))
      .groupBy(col("event_type"), col("cents")).agg(count(lit(1)).as("cnt"))
      .withColumn("cum", sum(col("cnt")).over(byType.orderBy(col("cents"))))
      .withColumn("n", sum(col("cnt")).over(byType))
    def pos(q: Double) = lit(q) * (col("n") - 1).cast("double")
    def picks(q: Double, name: String): Seq[org.apache.spark.sql.Column] = Seq(
      min(when(col("cum") >= floor(pos(q)).cast("long") + 1, col("cents"))).as(s"${name}_lo"),
      min(when(col("cum") >= ceil(pos(q)).cast("long") + 1, col("cents"))).as(s"${name}_hi"))
    def interp(q: Double, name: String): org.apache.spark.sql.Column = {
      val p = pos(q)
      val vLo = col(s"${name}_lo").cast("double") / 100.0
      val vHi = col(s"${name}_hi").cast("double") / 100.0
      round(when(floor(p) === ceil(p), vLo)
        .otherwise((ceil(p) - p) * vLo + (p - floor(p)) * vHi), 4).as(name)
    }
    hist
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        (picks(0.5, "p50") ++ picks(0.9, "p90") ++ picks(0.99, "p99")): _*)
      .select(col("event_type"), interp(0.5, "p50"), interp(0.9, "p90"), interp(0.99, "p99"))
  }

  /** Customers with no orders: broadcast-friendly left anti join. */
  def customersNoOrders(s: SparkSession, dir: String): DataFrame =
    Graft.customer(s, dir)
      .join(Graft.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** Global top-20 tokens by document frequency — explode + two-phase
    * count + TakeOrderedAndProject (never a global sort).
    */
  def topTokens(s: SparkSession, dir: String): DataFrame =
    Graft.documents(s, dir)
      .select(explode(array_distinct(split(col("text"), "\\s+"))).as("tok"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("tok"))
      .limit(20)

  /** click -> purchase funnel per user: first click, then the first
    * purchase at-or-after it. One grouped pass with conditional
    * aggregates (no self-join).
    */
  def funnel(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000000000").as("sec"))
      .groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "click", col("sec"))).as("first_click"))
      .join(
        Graft.events(s, dir)
          .select(col("user_id").as("p_user"), col("event_type"),
            expr("ts div 1000000000").as("sec"))
          .filter(col("event_type") === "purchase"),
        col("user_id") === col("p_user") && col("sec") >= col("first_click"))
      .groupBy(col("user_id"), col("first_click"))
      .agg(min(col("sec")).as("first_purchase"))

  /** Customers WITH at least one open-ish order: left semi join. */
  def customersWithOrders(s: SparkSession, dir: String): DataFrame =
    Graft.customer(s, dir)
      .join(Graft.orders(s, dir).filter(col("o_orderstatus") === "O"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_mktsegment"))

  /** Exact distinct-count aggregation per segment (distinct-agg expand). */
  def segmentDistinct(s: SparkSession, dir: String): DataFrame =
    Graft.customer(s, dir)
      .join(Graft.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment"))
      .agg(
        countDistinct(col("c_custkey")).as("n_customers"),
        countDistinct(col("o_orderpriority")).as("n_priorities"),
        count(lit(1)).as("n_orders"))

  /** Running (cumulative) spend per customer ordered by order date —
    * unbounded-preceding window frame.
    */
  def runningSpend(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Graft.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("cum_spend"))
  }

  /** Cohort retention: users grouped by first-active day, distinct
    * actives per (cohort, day-age). Two grouped passes — both
    * partial-agg friendly; the active-days set is tiny per user.
    */
  def retention(s: SparkSession, dir: String): DataFrame = {
    val days = Graft.events(s, dir)
      .select(col("user_id"), expr("(ts div 1000000000) div 86400").as("day"))
      .distinct()
    val cohorts = days.groupBy(col("user_id")).agg(min(col("day")).as("cohort_day"))
    days.join(cohorts, "user_id")
      .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("age_days"))
      .agg(countDistinct(col("user_id")).as("n_active"))
  }

  /** Sketch-based per-type stats: HLL distinct users + t-digest-style
    * approximate percentiles. The 100 TB counterpart of
    * [[eventQuantiles]] — sketches merge associatively (one partial-agg
    * pass, bounded memory) where exact percentiles sort each group.
    * Rows-only check: sketch outputs are engine-specific by design;
    * EventsSpec bounds them against the exact values.
    */
  def approxStats(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)
      .groupBy(col("event_type"))
      .agg(
        approx_count_distinct(col("user_id")).as("approx_users"),
        expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)").as("pcts"),
        count(lit(1)).as("n"))
      // scalar-only output: the driver's rows-only gate sorts every column
      .select(col("event_type"), col("approx_users"),
        round(col("pcts").getItem(0), 2).as("p50"),
        round(col("pcts").getItem(1), 2).as("p90"),
        round(col("pcts").getItem(2), 2).as("p99"),
        col("n"))

  /** CUBE over (mktsegment, orderpriority): all four grouping sets in
    * one pass (Expand + single aggregation — not four scans).
    */
  def cubeOrders(s: SparkSession, dir: String): DataFrame =
    Graft.customer(s, dir)
      .join(Graft.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .cube(col("c_mktsegment"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("sum_price"))
      .select(
        coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("sum_price"))

  /** Per-event-type z-score outliers (|z| >= 3): one grouped pass for
    * (count, sum, sum-of-squares), broadcast back, score as a pure
    * projection — mergeable moments, never a second scan of raw values.
    */
  def zscoreOutliers(s: SparkSession, dir: String): DataFrame = {
    val stats = Graft.events(s, dir)
      .groupBy(col("event_type").as("t"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sv"),
        sum(col("value") * col("value")).as("svv"))
    Graft.events(s, dir)
      .join(broadcast(stats), col("event_type") === col("t"))
      .select(col("event_id"), col("event_type"), col("value"),
        expr("""round((value - sv / n)
                | / sqrt((svv - sv * sv / n) / (n - 1)), 4)""".stripMargin).as("z"))
      .filter(abs(col("z")) >= 3.0)
  }

  /** Tumbling value histogram per event type (width-50 buckets) —
    * exact integer bucket arithmetic, one aggregation.
    */
  def valueHistogram(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)
      .groupBy(col("event_type"),
        (floor(col("value") / 50) * 50).cast("long").as("bucket_lo"))
      .agg(count(lit(1)).as("n"))

  /** Semi-structured props: JSON field extraction (no pre-parsing pass,
    * schema-on-read) + grouped stats over the extracted value. At scale
    * the extraction is a codegen'd projection on the scan — a dedicated
    * parse stage would double-materialize the column.
    */
  def propsJson(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)
      .select(col("event_type"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(countDistinct(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** Robust per-type outlier stats: median, MAD (median absolute
    * deviation), and the count of values beyond 3 MADs — the
    * skew-resistant twin of [[zscoreOutliers]]. Both medians run over a
    * (event_type, value) HISTOGRAM via [[Percentiles.interp]] instead
    * of a buffering `percentile()` (which would hold ~N/|types| doubles
    * in one aggregation buffer at 100 TB): `value` is two-decimal
    * currency, so distinct raw doubles are bounded and the groupBy is
    * map-side combinable. The deviation multiset derives from the SAME
    * histogram (|value - med| per distinct value, counts preserved) —
    * one scan of events total where the percentile() formulation took
    * three — and the outlier count is a weighted sum over that tiny
    * frame. Both medians are rounded to 4dp BEFORE the dependent
    * arithmetic so the outlier comparison is the same IEEE expression
    * in both engines; interpolation reproduces percentile()'s
    * arithmetic bit-exactly, so the DuckDB quantile_cont oracle
    * hash-matches unchanged.
    */
  def madOutliers(s: SparkSession, dir: String): DataFrame = {
    // both histograms are persisted: interp + the downstream joins
    // reference each of them several times, and an un-persisted frame
    // re-expands to a fresh events scan per reference (measured 29
    // scans / 6.5x the runtime without the memo). The cached frames
    // are |distinct (type, cents)| rows — KBs at any corpus size.
    val hist = Graft.memoCache("mad_hist", dir)(Graft.events(s, dir)
      .groupBy(col("event_type"), col("value")).agg(count(lit(1)).as("cnt")))
    val med = Percentiles.interp(hist, Seq("event_type"), "value", "cnt",
        Seq(0.5 -> "m"), twoLevel = false)
      .select(col("event_type").as("mt"), round(col("m"), 4).as("med"))
    val devHist = Graft.memoCache("mad_devhist", dir)(
      hist.join(broadcast(med), col("event_type") === col("mt"))
        .groupBy(col("event_type"), abs(col("value") - col("med")).as("dev"))
        .agg(sum(col("cnt")).as("cnt")))
    val mad = Percentiles.interp(devHist, Seq("event_type"), "dev", "cnt",
        Seq(0.5 -> "d"), twoLevel = false)
      .select(col("event_type").as("dt"), round(col("d"), 4).as("mad"))
    devHist.join(broadcast(mad), col("event_type") === col("dt"))
      .groupBy(col("event_type"))
      .agg(max(col("mad")).as("mad"),
        sum(when(col("dev") > col("mad") * 3, col("cnt")).otherwise(0L))
          .as("n_outliers"))
      .join(broadcast(med), col("event_type") === col("mt"))
      .select(col("event_type"), col("med"), col("mad"), col("n_outliers"))
  }

  /** 30-day trailing spend per customer order — a RANGE window frame
    * over integer epoch days (value-based, so same-day orders aggregate
    * identically regardless of row order). Money travels as integer
    * cents: float window sums are accumulation-order-sensitive, integer
    * sums are exact and mergeable.
    */
  def trailingSpend(s: SparkSession, dir: String): DataFrame = {
    val base = Graft.orders(s, dir).select(
      col("o_custkey"), col("o_orderkey"),
      datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("day"),
      expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_custkey")).orderBy(col("day")).rangeBetween(-30, 0)
    base.select(col("o_custkey"), col("o_orderkey"), col("day"),
      sum(col("cents")).over(w).as("spend_30d_cents"),
      count(lit(1)).over(w).as("n_orders_30d"))
  }

  /** Orders strictly above their customer's average order value — the
    * correlated-scalar-subquery pattern, decorrelated into one window
    * pass (no join, no second scan). The comparison is pure integer
    * arithmetic (cents * n > sum_cents), exact at any scale.
    */
  def aboveCustomerAvg(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("o_custkey"))
    Graft.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("cents"))
      .withColumn("sum_cents", sum(col("cents")).over(w))
      .withColumn("n", count(lit(1)).over(w))
      .filter(col("cents") * col("n") > col("sum_cents"))
      .select(col("o_orderkey"), col("o_custkey"), col("cents").as("price_cents"),
        expr("sum_cents * 10000 div n").as("cust_avg_micros"))
  }

  /** Cheapest lineitem per part (argmin join): rank-1 window with a
    * total-order tie-break. The rank column is dropped, so
    * WindowTopKRule rewrites this into the bounded-heap TopKPerKey
    * operator (k=1) — per-key argmin never global-sorts.
    */
  def cheapestPerPart(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("l_partkey"))
      .orderBy(col("l_extendedprice"), col("l_orderkey"), col("l_linenumber"))
    Graft.lineitem(s, dir)
      .select(col("l_partkey"), col("l_orderkey"),
        col("l_linenumber").cast("long").as("l_linenumber"), col("l_extendedprice"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** Event-type transition matrix (first-order Markov): per user the
    * time-ordered next event via lead(), pair counts, and per-source
    * transition probabilities as integer micros (window sum, no second
    * pass). One shuffle on user_id + one on the 5x5 pair key.
    */
  def eventTransitions(s: SparkSession, dir: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val byFrom = org.apache.spark.sql.expressions.Window.partitionBy(col("from_type"))
    Graft.events(s, dir)
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"))
      .withColumn("to_type", lead(col("event_type"), 1).over(byUser))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("sum_n", sum(col("n")).over(byFrom))
      .select(col("from_type"), col("to_type"), col("n"),
        expr("n * 1000000 div sum_n").as("prob_micros"))
  }

  /** Sliding-window aggregation (1 h window, 15 min slide) per event
    * type — the batch twin of the streaming windowed aggregation; every
    * event lands in 4 overlapping windows via Spark's native window()
    * expansion (a projection, not a join). Window starts are epoch
    * seconds for the cross-engine compare.
    */
  def slidingCounts(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)
      .select(col("event_type"), expr("timestamp_seconds(ts div 1000000000)").as("t"),
        col("value"))
      .groupBy(window(col("t"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("event_type"), col("window.start").cast("long").as("wstart"),
        col("n"), col("sum_value"))

  /** Customer spend quartiles WITHOUT a global sort: exact quantile
    * thresholds from a spend-cents histogram ([[Percentiles.interp]] —
    * the former single-buffer global `percentile()` held every
    * customer's spend in ONE aggregation buffer, ~8 GB+ at 10^9
    * customers), floor'd to integer cents (floor is tie-safe across
    * engines where round() is not), broadcast back, bucket as a
    * projection. ntile() would force a single-partition global window;
    * this shape stays partial-agg passes + a map at any scale, and the
    * spend subtree shuffles o_custkey once (ReusedExchange serves both
    * the histogram and the projection).
    */
  def spendQuartiles(s: SparkSession, dir: String): DataFrame = {
    val spend = Graft.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("spend_cents"))
    val hist = Graft.memoCache("spendq_hist", dir)(
      spend.groupBy(col("spend_cents")).agg(count(lit(1)).as("cnt")))
    val th = Percentiles.interp(hist, Nil, "spend_cents", "cnt",
        Seq(0.25 -> "q1", 0.5 -> "q2", 0.75 -> "q3"))
      .select(floor(col("q1")).as("t1"), floor(col("q2")).as("t2"),
        floor(col("q3")).as("t3"))
    spend.crossJoin(broadcast(th))
      .select(col("o_custkey"), col("spend_cents"),
        expr("""1 + if(spend_cents > t1, 1, 0) + if(spend_cents > t2, 1, 0)
                |  + if(spend_cents > t3, 1, 0)""".stripMargin).cast("long").as("quartile"))
  }

  /** DAU / trailing-7-day WAU engagement per active day. Exact distinct
    * over a sliding window cannot use a window sum (distinct doesn't
    * merge), so each (user, day) activity row is exploded to the 7
    * target days it counts toward — a bounded x7 expansion — then both
    * distinct counts are grouped passes. At 100 TB the same shape runs
    * on HLL sketches (events_approx_stats) with the explode unchanged.
    */
  def dauWau(s: SparkSession, dir: String): DataFrame = {
    val ud = Graft.events(s, dir)
      .select(col("user_id"), expr("ts div 1000000000 div 86400").as("day"))
      .distinct()
    val dau = ud.groupBy(col("day")).agg(countDistinct(col("user_id")).as("dau"))
    val wau = ud
      .select(col("user_id"), explode(expr("sequence(day, day + 6)")).as("td"))
      .distinct()
      .groupBy(col("td")).agg(countDistinct(col("user_id")).as("wau"))
    dau.join(wau, col("day") === col("td"))
      .select(col("day"), col("dau"), col("wau"),
        expr("dau * 1000000 div wau").as("stickiness_micros"))
  }

  /** Sketch-based DAU / trailing-7-day WAU — the documented 100 TB
    * swap-in for [[dauWau]]: per-day DataSketches HLL sketches of the
    * active-user set (a mergeable aggregate a production pipeline
    * stores per day), DAU = each day's estimate, WAU = estimate of the
    * UNION of the trailing 7 sketches via the same bounded ×7
    * day-explode. Where the exact form's sliding distinct re-reads
    * every (user, day) row, the sketch form merges 7 fixed-size
    * sketches per day — state per day is KBs regardless of user count.
    * Rows-only gate (sketch bits are engine-specific); the spec bounds
    * both estimates against the exact operator.
    */
  def dauWauHll(s: SparkSession, dir: String): DataFrame = {
    val daily = Graft.events(s, dir)
      .select(col("user_id"), expr("ts div 1000000000 div 86400").as("day"))
      .groupBy(col("day"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    val wau = daily
      .select(explode(expr("sequence(day, day + 6)")).as("td"), col("sk"))
      .groupBy(col("td"))
      .agg(expr("hll_union_agg(sk)").as("usk"))
    daily.join(wau, col("day") === col("td"))
      .select(col("day"),
        expr("hll_sketch_estimate(sk)").as("dau_est"),
        expr("hll_sketch_estimate(usk)").as("wau_est"))
  }

  /** Wide-table PIVOT: order counts per (segment x priority) with the
    * priority domain pinned (pivot with an explicit value list is one
    * Expand + one aggregation — an unpinned pivot adds a distinct-values
    * collect first, a driver round-trip worth avoiding at scale).
    */
  def pivotOrders(s: SparkSession, dir: String): DataFrame =
    Graft.customer(s, dir)
      .join(Graft.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment").as("segment"))
      .pivot("o_orderpriority",
        Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"))
      .agg(count(lit(1)))
      .select(col("segment"),
        coalesce(col("1-URGENT"), lit(0L)).as("n_urgent"),
        coalesce(col("2-HIGH"), lit(0L)).as("n_high"),
        coalesce(col("3-MEDIUM"), lit(0L)).as("n_medium"),
        coalesce(col("4-NOT SPECIFIED"), lit(0L)).as("n_notspec"),
        coalesce(col("5-LOW"), lit(0L)).as("n_low"))

  /** Approximate frequent tokens via freqItems (a mergeable
    * misra-gries-style summary): the sketch counterpart of
    * text_topk_tokens — single pass, bounded memory, no global sort.
    * Sketch contents are engine-specific, so this is rows-only; the
    * spec bounds it against the exact top-20 (all must be present at
    * this support threshold).
    */
  def topTokensApprox(s: SparkSession, dir: String): DataFrame =
    Graft.documents(s, dir)
      .select(explode(array_distinct(split(col("text"), "\\s+"))).as("tok"))
      .stat.freqItems(Seq("tok"), 0.01)
      .select(explode(col("tok_freqItems").cast("array<string>")).as("tok"))

  /** Time-series gap filling: the hourly count series per event type
    * with missing hours materialized as zero rows (the step every
    * charting/forecasting consumer needs). The dense hour grid comes
    * from a per-type sequence explode — bounded by time-span x types,
    * independent of event volume — and the left join back to the sparse
    * counts is co-partitioned on (type, hour).
    */
  def gapfillHourly(s: SparkSession, dir: String): DataFrame = {
    // memoized: the (type, hour) count rollup is grid-sized and feeds
    // the gapfill grid (twice: bounds + join-back) AND both sides of
    // the EWMA consumer — cached once instead of re-scanning events
    // per reference (the static plan otherwise repeats the scan 3x)
    val counts = Graft.memoCache("events_hour_counts", dir)(
      Graft.events(s, dir)
        .select(col("event_type"), expr("ts div 1000000000 div 3600").as("hour"))
        .groupBy(col("event_type"), col("hour"))
        .agg(count(lit(1)).as("n")))
    val grid = counts.groupBy(col("event_type"))
      .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
      .select(col("event_type"), explode(expr("sequence(h0, h1)")).as("hour"))
    grid.join(counts, Seq("event_type", "hour"), "left")
      .select(col("event_type"), col("hour"), coalesce(col("n"), lit(0L)).as("n"))
  }

  /** EWMA-smoothed hourly event counts (λ=1/2, truncated at 8 taps, zero-
    * padded history): each dense-grid hour contributes to itself and the
    * next 7 hours with weight 2^(7−k), so the smoothed value is an EXACT
    * integer in 1/128ths — no float recurrence, no order dependence, and
    * (unlike the sequential EWMA definition) fully parallel: a bounded
    * ×8 explode + one grouped sum, the dauWau day-explode pattern on the
    * [[gapfillHourly]] dense grid. The grid join-back keeps only real
    * grid hours (no phantom targets past the series end).
    */
  def ewmaHourly(s: SparkSession, dir: String): DataFrame = {
    val dense = gapfillHourly(s, dir)
    val contrib = dense
      .select(col("event_type").as("c_type"), col("n"),
        posexplode(expr("sequence(hour, hour + 7)")).as(Seq("k", "th")))
      .select(col("c_type"), col("th"),
        expr("n * shiftleft(cast(1 as bigint), cast(7 - k as int))").as("w"))
      .groupBy(col("c_type"), col("th"))
      .agg(sum(col("w")).as("ewma_x128"))
    dense.select(col("event_type"), col("hour"))
      .join(contrib, col("event_type") === col("c_type") && col("hour") === col("th"))
      .select(col("event_type"), col("hour"), col("ewma_x128"))
  }

  /** Audience overlap between event types: exact Jaccard similarity of
    * user sets per type pair — the cross-sell / funnel-adjacency signal.
    * One distinct pass builds the (user, type) incidence; the pair join
    * shuffles both sides on the SAME user_id subtree (ReusedExchange
    * computes the incidence once); per-type totals are a types-sized
    * broadcast; the similarity is exact integer micros.
    */
  def typeOverlap(s: SparkSession, dir: String): DataFrame = {
    val ut = Graft.events(s, dir)
      .select(col("user_id"), col("event_type")).distinct()
    val perType = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
    val pairs = ut
      .join(ut.select(col("user_id").as("u2"), col("event_type").as("t2")),
        col("user_id") === col("u2") && col("event_type") < col("t2"))
      .groupBy(col("event_type").as("t1"), col("t2"))
      .agg(count(lit(1)).as("n_both"))
    pairs
      .join(broadcast(perType.select(col("event_type").as("t1"), col("n").as("n1"))), "t1")
      .join(broadcast(perType.select(col("event_type").as("t2"), col("n").as("n2"))), "t2")
      .select(col("t1"), col("t2"), col("n_both"), col("n1"), col("n2"),
        expr("n_both * 1000000 div (n1 + n2 - n_both)").as("jaccard_micros"))
  }

  /** Peak hour per event type: the hour with the most events, picked by
    * ONE hash-aggregatable struct-argmax over the memoized hourly
    * counts (no window sort, no self-join — the dedup_canonical
    * pattern on the time axis); ties break to the earliest hour via
    * the negated-hour struct field.
    */
  def peakHour(s: SparkSession, dir: String): DataFrame =
    gapfillHourly(s, dir)
      .groupBy(col("event_type"))
      .agg(max(struct(col("n"), (-col("hour")).as("neg_hour"))).as("mx"),
        sum(col("n")).as("n_total"))
      .select(col("event_type"), (-col("mx.neg_hour")).as("peak_hour"),
        col("mx.n").as("peak_n"), col("n_total"),
        expr("mx.n * 1000000 div greatest(n_total, 1)").as("peak_share_micros"))

  /** Weekday seasonality profile: event counts and mean value per
    * (day-of-week, type). Day-of-week = epoch-day mod 7 (1970-01-01 was
    * a Thursday → 0=Thu), pure integer arithmetic — no timezone or
    * locale dependency to diverge across engines. One map-side
    * combinable aggregate.
    */
  def weekdayProfile(s: SparkSession, dir: String): DataFrame =
    Graft.events(s, dir)
      .select(col("event_type"),
        expr("(ts div 1000000000 div 86400) % 7").as("dow"),
        expr("cast(round(value * 100) as bigint)").as("cents"))
      .groupBy(col("dow"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("cents")).as("sum_cents"))
      .select(col("dow"), col("event_type"), col("n_events"), col("sum_cents"),
        expr("sum_cents div n_events").as("mean_cents"))

  /** Inter-arrival-time distribution per event type: power-of-two
    * histogram of the seconds between a user's consecutive events of
    * that type — the burstiness/queueing profile (tight buckets = bots
    * or retry storms, heavy tail = organic usage). One (type, user)
    * lag window, then the same integer log2 bucketing as
    * doc_length_histogram (binary-representation length — no float
    * boundaries); both aggregates map-side combinable.
    */
  def interarrival(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("event_type"), col("user_id"))
      .orderBy(col("sec"), col("event_id"))
    Graft.events(s, dir)
      .select(col("event_type"), col("user_id"), col("event_id"),
        expr("ts div 1000000000").as("sec"))
      .withColumn("gap", col("sec") - lag(col("sec"), 1).over(w))
      .filter(col("gap").isNotNull && col("gap") >= 1L)
      .select(col("event_type"), (length(bin(col("gap"))) - 1).cast("long").as("bucket"),
        col("gap"))
      .groupBy(col("event_type"), col("bucket"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("gap")).as("sum_gap_sec"))
  }

  /** Growth accounting: new users per day (first-ever-seen cohort) and
    * the running total — the top line of every growth report. First
    * appearance = one grouped min per user; the cumulative sum rides a
    * day-ordered window over the DAY-level frame, which is bounded by
    * the calendar (not the corpus) at any scale. That calendar bound is
    * made explicit in the plan: the earliest-10000-days cut (27 years —
    * vacuous for any real event stream) plans TakeOrderedAndProject, so
    * the running-total window orders an already-single-partition bounded
    * frame instead of forcing an Exchange(SinglePartition).
    */
  def newUsers(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("day"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    Graft.events(s, dir)
      .select(col("user_id"), expr("ts div 1000000000 div 86400").as("day"))
      .groupBy(col("user_id")).agg(min(col("day")).as("day"))
      .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
      .orderBy(col("day")).limit(10000) // calendar bound, made structural
      .withColumn("cum_users", sum(col("n_new")).over(w))
  }

  /** Whale concentration (Pareto check): what share of total event value
    * the top-decile users account for. The p90 threshold is a floor'd
    * interpolated percentile over the per-user cents HISTOGRAM
    * ([[Percentiles.interp]] — the former global `percentile()`
    * buffered every user's total in one task, corpus-scaling at
    * 100 TB), broadcast back; the report is one conditional aggregate —
    * exact integer cents throughout, the concentration share in micros.
    */
  def pareto(s: SparkSession, dir: String): DataFrame = {
    val per = Graft.events(s, dir)
      .groupBy(col("user_id"))
      .agg(sum(expr("cast(round(value * 100) as bigint)")).as("cents"))
    val hist = Graft.memoCache("pareto_hist", dir)(
      per.groupBy(col("cents")).agg(count(lit(1)).as("cnt")))
    val th = Percentiles.interp(hist, Nil, "cents", "cnt", Seq(0.9 -> "p"))
      .select(floor(col("p")).as("p90"))
    per.crossJoin(broadcast(th))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("cents") > col("p90"), 1L).otherwise(0L)).as("n_top"),
        sum(col("cents")).as("total_cents"),
        sum(when(col("cents") > col("p90"), col("cents")).otherwise(0L)).as("top_cents"))
      .select(col("n_users"), col("n_top"), col("total_cents"), col("top_cents"),
        expr("top_cents * 1000000 div total_cents").as("top_share_micros"))
  }

  /** RFM segmentation over purchase events: per-user recency (days since
    * last purchase, against the corpus max timestamp), frequency, and
    * monetary value, median-split into 8 'Rfm'-style segments. Both
    * scalar frames (corpus max, medians) are one-row broadcasts — the
    * spendQuartiles pattern; thresholds floor to the integer grid so
    * the split is reproducible across engines. One user_id shuffle
    * (ReusedExchange serves both the threshold branch and the
    * projection). The three medians come from ONE stacked
    * (metric, value) histogram through [[Percentiles.interp]] — the
    * former `percentile()` triple buffered every user's recency /
    * frequency / monetary value in a single aggregation buffer.
    */
  def rfm(s: SparkSession, dir: String): DataFrame = {
    val nowSec = Graft.events(s, dir)
      .agg(max(expr("ts div 1000000000")).as("now_sec"))
    val per = Graft.events(s, dir)
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id"))
      .agg(max(expr("ts div 1000000000")).as("last_sec"),
        count(lit(1)).as("frequency"),
        sum(expr("cast(round(value * 100) as bigint)")).as("monetary_cents"))
      .crossJoin(broadcast(nowSec))
      .select(col("user_id"),
        expr("(now_sec - last_sec) div 86400").as("recency_days"),
        col("frequency"), col("monetary_cents"))
    val hist = Graft.memoCache("rfm_hist", dir)(per
      .select(expr(
        "stack(3, 'r', recency_days, 'f', frequency, 'm', monetary_cents) as (metric, v)"))
      .groupBy(col("metric"), col("v")).agg(count(lit(1)).as("cnt")))
    val th = Percentiles.interp(hist, Seq("metric"), "v", "cnt", Seq(0.5 -> "p"))
      .agg(max(when(col("metric") === "r", floor(col("p")))).as("r_med"),
        max(when(col("metric") === "f", floor(col("p")))).as("f_med"),
        max(when(col("metric") === "m", floor(col("p")))).as("m_med"))
    per.crossJoin(broadcast(th))
      .select(col("user_id"), col("recency_days"), col("frequency"), col("monetary_cents"),
        concat(
          when(col("recency_days") <= col("r_med"), lit("R")).otherwise(lit("r")),
          when(col("frequency") > col("f_med"), lit("F")).otherwise(lit("f")),
          when(col("monetary_cents") > col("m_med"), lit("M")).otherwise(lit("m")))
          .as("segment"))
  }

  /** Longest consecutive-day activity streak per user — the
    * gaps-and-islands classic every engagement report needs: distinct
    * (user, day) activity, island id = day − row_number within the
    * user (consecutive days share it), per-island lengths, per-user
    * rollup. The window partitions by the corpus-scaling user_id over
    * the ALREADY-DEDUPLICATED activity frame (≤ days-per-user rows per
    * group), and all three aggregates are map-side combinable on the
    * same user_id hashing — ReusedExchange collapses the chain to one
    * shuffle.
    */
  def streaks(s: SparkSession, dir: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("day"))
    Graft.events(s, dir)
      .select(col("user_id"), expr("(ts div 1000000000) div 86400").as("day"))
      .distinct()
      .withColumn("island", col("day") - row_number().over(w))
      .groupBy(col("user_id"), col("island"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest_streak"),
        sum(col("len")).as("n_active_days"))
  }

  /** Set operators over user activity: clicked-but-never-purchased
    * (EXCEPT), clicked-and-purchased (INTERSECT), either (UNION
    * DISTINCT) — Spark's native set operations, each a distinct-shaped
    * aggregation, combined via three one-row cross joins.
    */
  def userSetOps(s: SparkSession, dir: String): DataFrame = {
    def users(t: String) = Graft.events(s, dir)
      .filter(col("event_type") === t).select(col("user_id")).distinct()
    // each set operator references both distinct subtrees, but no cache is
    // needed: all three branches shuffle the SAME canonical subtree on
    // user_id, so ReusedExchange computes each distinct once (asserted on
    // the executed plan in ScaleLayoutSpec; PlanLintSpec lints the lazy plan)
    val clicks = users("click")
    val purchases = users("purchase")
    clicks.except(purchases).agg(count(lit(1)).as("n_click_only"))
      .crossJoin(clicks.intersect(purchases).agg(count(lit(1)).as("n_both")))
      .crossJoin(clicks.union(purchases).distinct().agg(count(lit(1)).as("n_either")))
  }

  val oracle: Map[String, String] = Map(
    "events_streaks" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
        |i AS (SELECT user_id, day,
        |  day - row_number() OVER (PARTITION BY user_id ORDER BY day) AS island FROM d),
        |l AS (SELECT user_id, island, count(*) AS len FROM i GROUP BY 1, 2)
        |SELECT user_id, CAST(count(*) AS BIGINT) AS n_streaks,
        | CAST(max(len) AS BIGINT) AS longest_streak,
        | CAST(sum(len) AS BIGINT) AS n_active_days
        |FROM l GROUP BY 1""".stripMargin,
    "events_peak_hour" ->
      """WITH c AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
        |  CAST(count(*) AS BIGINT) AS n FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS hour FROM (
        |  SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM c GROUP BY 1)),
        |d AS (SELECT g.event_type, g.hour, coalesce(c.n, 0) AS n
        |  FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.hour),
        |r AS (SELECT *, row_number() OVER (PARTITION BY event_type
        |        ORDER BY n DESC, hour) AS rn,
        |  CAST(sum(n) OVER (PARTITION BY event_type) AS BIGINT) AS n_total FROM d)
        |SELECT event_type, hour AS peak_hour, CAST(n AS BIGINT) AS peak_n, n_total,
        | CAST(n AS BIGINT) * 1000000 // greatest(n_total, 1) AS peak_share_micros
        |FROM r WHERE rn = 1""".stripMargin,
    "events_weekday" ->
      """SELECT (CAST(floor(epoch(ts)) AS BIGINT) // 86400) % 7 AS dow,
        | event_type, count(*) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) // count(*) AS mean_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_interarrival" ->
      """WITH e AS (SELECT event_type, user_id, event_id,
        |   CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |g AS (SELECT event_type,
        |  sec - lag(sec) OVER (PARTITION BY event_type, user_id
        |                       ORDER BY sec, event_id) AS gap
        | FROM e)
        |SELECT event_type,
        | CAST(length(printf('%b', gap)) - 1 AS BIGINT) AS bucket,
        | count(*) AS n_gaps, CAST(sum(gap) AS BIGINT) AS sum_gap_sec
        |FROM g WHERE gap IS NOT NULL AND gap >= 1
        |GROUP BY 1, 2""".stripMargin,
    "events_new_users" ->
      """WITH f AS (SELECT user_id,
        |  min(CAST(floor(epoch(ts)) AS BIGINT) // 86400) AS day
        | FROM events GROUP BY 1),
        |d AS (SELECT day, count(*) AS n_new FROM f GROUP BY 1
        |      ORDER BY day LIMIT 10000)
        |SELECT day, n_new,
        | CAST(sum(n_new) OVER (ORDER BY day
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_users
        |FROM d""".stripMargin,
    "events_pareto" ->
      """WITH p AS (SELECT user_id,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM events GROUP BY 1),
        |th AS (SELECT CAST(floor(quantile_cont(cents, 0.9)) AS BIGINT) AS p90 FROM p)
        |SELECT count(*) AS n_users,
        | CAST(sum(CASE WHEN cents > p90 THEN 1 ELSE 0 END) AS BIGINT) AS n_top,
        | CAST(sum(cents) AS BIGINT) AS total_cents,
        | CAST(sum(CASE WHEN cents > p90 THEN cents ELSE 0 END) AS BIGINT) AS top_cents,
        | CAST(sum(CASE WHEN cents > p90 THEN cents ELSE 0 END) AS BIGINT)
        |   * 1000000 // CAST(sum(cents) AS BIGINT) AS top_share_micros
        |FROM p, th""".stripMargin,
    "events_rfm" ->
      """WITH nw AS (SELECT max(CAST(floor(epoch(ts)) AS BIGINT)) AS now_sec FROM events),
        |p AS (SELECT user_id,
        |  max(CAST(floor(epoch(ts)) AS BIGINT)) AS last_sec,
        |  count(*) AS frequency,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
        | FROM events WHERE event_type = 'purchase' GROUP BY 1),
        |m AS (SELECT user_id, (now_sec - last_sec) // 86400 AS recency_days,
        |  frequency, monetary_cents FROM p, nw),
        |th AS (SELECT CAST(floor(quantile_cont(recency_days, 0.5)) AS BIGINT) AS r_med,
        |  CAST(floor(quantile_cont(frequency, 0.5)) AS BIGINT) AS f_med,
        |  CAST(floor(quantile_cont(monetary_cents, 0.5)) AS BIGINT) AS m_med FROM m)
        |SELECT user_id, recency_days, frequency, monetary_cents,
        | (CASE WHEN recency_days <= r_med THEN 'R' ELSE 'r' END)
        |  || (CASE WHEN frequency > f_med THEN 'F' ELSE 'f' END)
        |  || (CASE WHEN monetary_cents > m_med THEN 'M' ELSE 'm' END) AS segment
        |FROM m, th""".stripMargin,
    "events_ewma" ->
      """WITH c AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
        |  count(*) AS n FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS hour FROM (
        |  SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM c GROUP BY 1)),
        |d AS (SELECT g.event_type, g.hour, coalesce(c.n, 0) AS n
        |  FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.hour),
        |e AS (SELECT d.event_type, d.hour + k.k AS th,
        |   d.n * (CAST(1 AS BIGINT) << (7 - k.k)) AS w
        |  FROM d CROSS JOIN (SELECT unnest(range(0, 8)) AS k) k)
        |SELECT d.event_type, d.hour, CAST(sum(e.w) AS BIGINT) AS ewma_x128
        |FROM d JOIN e ON d.event_type = e.event_type AND d.hour = e.th
        |GROUP BY 1, 2""".stripMargin,
    "events_type_overlap" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |pt AS (SELECT event_type, CAST(count(*) AS BIGINT) AS n FROM ut GROUP BY 1),
        |pr AS (SELECT a.event_type AS t1, b.event_type AS t2, count(*) AS n_both
        | FROM ut a JOIN ut b ON a.user_id = b.user_id AND a.event_type < b.event_type
        | GROUP BY 1, 2)
        |SELECT t1, t2, n_both, p1.n AS n1, p2.n AS n2,
        | n_both * 1000000 // (p1.n + p2.n - n_both) AS jaccard_micros
        |FROM pr JOIN pt p1 ON t1 = p1.event_type JOIN pt p2 ON t2 = p2.event_type""".stripMargin,
    "events_gapfill" ->
      """WITH c AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hour,
        |  count(*) AS n FROM events GROUP BY 1, 2),
        |g AS (SELECT event_type, unnest(range(h0, h1 + 1)) AS hour FROM (
        |  SELECT event_type, min(hour) AS h0, max(hour) AS h1 FROM c GROUP BY 1))
        |SELECT g.event_type, g.hour, coalesce(c.n, 0) AS n
        |FROM g LEFT JOIN c ON g.event_type = c.event_type AND g.hour = c.hour""".stripMargin,
    "q_set_ops" ->
      """WITH cl AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
        |pu AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
        |SELECT
        | (SELECT count(*) FROM (SELECT * FROM cl EXCEPT SELECT * FROM pu)) AS n_click_only,
        | (SELECT count(*) FROM (SELECT * FROM cl INTERSECT SELECT * FROM pu)) AS n_both,
        | (SELECT count(*) FROM (SELECT * FROM cl UNION SELECT * FROM pu)) AS n_either""".stripMargin,
    "q_grouping_sets" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        | count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY GROUPING SETS ((r_name), (n_name))""".stripMargin,
    "q_pivot" ->
      """SELECT c_mktsegment AS segment,
        | count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS n_urgent,
        | count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS n_high,
        | count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS n_medium,
        | count(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 END) AS n_notspec,
        | count(CASE WHEN o_orderpriority = '5-LOW' THEN 1 END) AS n_low
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY 1""".stripMargin,
    "events_dau_wau" ->
      """WITH ud AS (SELECT DISTINCT user_id,
        |  CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
        |dau AS (SELECT day, count(DISTINCT user_id) AS dau FROM ud GROUP BY 1),
        |wau AS (SELECT td, count(DISTINCT user_id) AS wau FROM (
        |  SELECT DISTINCT user_id, unnest(range(day, day + 7)) AS td FROM ud)
        | GROUP BY 1)
        |SELECT day, dau, wau, dau * 1000000 // wau AS stickiness_micros
        |FROM dau JOIN wau ON day = td""".stripMargin,
    "events_transitions" ->
      """WITH p AS (SELECT event_type AS from_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS to_type
        | FROM events),
        |c AS (SELECT from_type, to_type, count(*) AS n FROM p
        |      WHERE to_type IS NOT NULL GROUP BY 1, 2)
        |SELECT from_type, to_type, n,
        | n * 1000000 // CAST(sum(n) OVER (PARTITION BY from_type) AS BIGINT) AS prob_micros
        |FROM c""".stripMargin,
    "events_sliding" ->
      """WITH e AS (SELECT event_type, CAST(floor(epoch(ts)) AS BIGINT) AS sec, value
        |  FROM events),
        |w AS (SELECT event_type, (sec // 900) * 900 - j * 900 AS wstart, value
        |      FROM e, range(0, 4) t(j))
        |SELECT event_type, wstart, count(*) AS n, round(sum(value), 2) AS sum_value
        |FROM w GROUP BY 1, 2""".stripMargin,
    "q_spend_quartiles" ->
      """WITH s AS (SELECT o_custkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS spend_cents
        | FROM orders GROUP BY 1),
        |th AS (SELECT CAST(floor(quantile_cont(spend_cents, 0.25)) AS BIGINT) AS t1,
        |        CAST(floor(quantile_cont(spend_cents, 0.5)) AS BIGINT) AS t2,
        |        CAST(floor(quantile_cont(spend_cents, 0.75)) AS BIGINT) AS t3 FROM s)
        |SELECT o_custkey, spend_cents,
        | CAST(1 + (CASE WHEN spend_cents > t1 THEN 1 ELSE 0 END)
        |    + (CASE WHEN spend_cents > t2 THEN 1 ELSE 0 END)
        |    + (CASE WHEN spend_cents > t3 THEN 1 ELSE 0 END) AS BIGINT) AS quartile
        |FROM s, th""".stripMargin,
    "events_mad" ->
      """WITH med AS (SELECT event_type AS mt, round(quantile_cont(value, 0.5), 4) AS med
        |  FROM events GROUP BY 1),
        |dev AS (SELECT event_type, value, med FROM events JOIN med ON event_type = mt),
        |mad AS (SELECT event_type AS dt, round(quantile_cont(abs(value - med), 0.5), 4) AS mad
        |  FROM dev GROUP BY 1)
        |SELECT event_type, max(med) AS med, max(mad) AS mad,
        | CAST(sum(CASE WHEN abs(value - med) > mad * 3 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
        |FROM dev JOIN mad ON event_type = dt
        |GROUP BY event_type""".stripMargin,
    "window_range" ->
      """WITH b AS (SELECT o_custkey, o_orderkey,
        |  date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS day,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders)
        |SELECT o_custkey, o_orderkey, CAST(day AS BIGINT) AS day,
        | CAST(sum(cents) OVER w AS BIGINT) AS spend_30d_cents,
        | count(*) OVER w AS n_orders_30d
        |FROM b WINDOW w AS (PARTITION BY o_custkey ORDER BY day
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_above_avg" ->
      """WITH b AS (SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice * 100) AS BIGINT) AS cents FROM orders),
        |w AS (SELECT o_orderkey, o_custkey, cents,
        |  CAST(sum(cents) OVER (PARTITION BY o_custkey) AS BIGINT) AS sum_cents,
        |  count(*) OVER (PARTITION BY o_custkey) AS n FROM b)
        |SELECT o_orderkey, o_custkey, cents AS price_cents,
        | sum_cents * 10000 // n AS cust_avg_micros
        |FROM w WHERE cents * n > sum_cents""".stripMargin,
    "q_argmin_join" ->
      """SELECT l_partkey, l_orderkey, l_linenumber, l_extendedprice FROM (
        | SELECT l_partkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
        |  l_extendedprice,
        |  row_number() OVER (PARTITION BY l_partkey
        |    ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn
        | FROM lineitem)
        |WHERE rn = 1""".stripMargin,
    "events_props_json" ->
      """SELECT event_type,
        | count(DISTINCT CAST(props->>'$.k' AS BIGINT)) AS n_k,
        | CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
        | min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
        | max(CAST(props->>'$.k' AS BIGINT)) AS max_k
        |FROM events GROUP BY 1""".stripMargin,
    "events_zscore" ->
      """WITH st AS (SELECT event_type AS t, count(*) AS n, sum(value) AS sv,
        |   sum(value * value) AS svv FROM events GROUP BY 1)
        |SELECT event_id, event_type, value,
        | round((value - sv / n) / sqrt((svv - sv * sv / n) / (n - 1)), 4) AS z
        |FROM events JOIN st ON event_type = t
        |WHERE abs(round((value - sv / n) / sqrt((svv - sv * sv / n) / (n - 1)), 4)) >= 3.0""".stripMargin,
    "events_histogram" ->
      """SELECT event_type, CAST(floor(value / 50) * 50 AS BIGINT) AS bucket_lo,
        | count(*) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "q_cube" ->
      """SELECT coalesce(c_mktsegment, 'ALL') AS segment,
        | coalesce(o_orderpriority, 'ALL') AS priority,
        | count(*) AS n_orders, round(sum(o_totalprice), 2) AS sum_price
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY CUBE (c_mktsegment, o_orderpriority)""".stripMargin,
    "q_rollup" ->
      """SELECT coalesce(r_name, 'ALL') AS region, coalesce(n_name, 'ALL') AS nation,
        | count(*) AS n_cust, round(sum(c_acctbal), 2) AS sum_bal
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |GROUP BY ROLLUP (r_name, n_name)""".stripMargin,
    "events_quantiles" ->
      """SELECT event_type,
        | round(quantile_cont(value, 0.5), 4) AS p50,
        | round(quantile_cont(value, 0.9), 4) AS p90,
        | round(quantile_cont(value, 0.99), 4) AS p99
        |FROM events GROUP BY event_type""".stripMargin,
    "q_antijoin" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "text_topk_tokens" ->
      """SELECT tok, count(*) AS df FROM (
        | SELECT doc_id, unnest(list_distinct(string_split_regex(text, '\s+'))) AS tok
        | FROM documents)
        |GROUP BY tok ORDER BY df DESC, tok LIMIT 20""".stripMargin,
    "q_semijoin" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "q_distinct" ->
      """SELECT c_mktsegment,
        | count(DISTINCT c_custkey) AS n_customers,
        | count(DISTINCT o_orderpriority) AS n_priorities,
        | count(*) AS n_orders
        |FROM customer JOIN orders ON c_custkey = o_custkey
        |GROUP BY c_mktsegment""".stripMargin,
    "window_running" ->
      """SELECT o_custkey, o_orderkey,
        | round(sum(o_totalprice) OVER (PARTITION BY o_custkey
        |   ORDER BY o_orderdate, o_orderkey
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS cum_spend
        |FROM orders""".stripMargin,
    "events_retention" ->
      """WITH d AS (SELECT DISTINCT user_id,
        |   CAST(floor(epoch(ts)) AS BIGINT) // 86400 AS day FROM events),
        |c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
        |SELECT cohort_day, day - cohort_day AS age_days,
        | count(DISTINCT d.user_id) AS n_active
        |FROM d JOIN c ON d.user_id = c.user_id
        |GROUP BY cohort_day, age_days""".stripMargin,
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type,
        |  CAST(floor(epoch(ts)) AS BIGINT) AS sec FROM events),
        |fc AS (SELECT user_id, min(CASE WHEN event_type = 'click' THEN sec END) AS first_click
        |       FROM e GROUP BY user_id)
        |SELECT e.user_id, first_click, min(sec) AS first_purchase
        |FROM e JOIN fc ON e.user_id = fc.user_id
        |WHERE event_type = 'purchase' AND sec >= first_click
        |GROUP BY e.user_id, first_click""".stripMargin,
  )
}
