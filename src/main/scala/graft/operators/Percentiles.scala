package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles from a value HISTOGRAM — the
  * scale-safe replacement for Spark's `percentile()` buffering
  * aggregate (an ObjectHashAggregate that holds EVERY input value of a
  * group in one aggregation buffer: ~N doubles in one task at 100 TB).
  *
  * The input is a (group..., value, cnt) histogram — one row per
  * distinct value, produced by a map-side-combinable groupBy — so the
  * frame this helper touches is |distinct values|, not |rows|. The
  * cumulative rank runs TWO-LEVEL: values are range-bucketed into at
  * most 256 buckets from the exact per-group min/max (one extra tiny
  * aggregate), bucket totals get a per-group prefix sum over a
  * <=256-row frame, and the within-bucket cumsum window partitions by
  * (group, bucket) — no single task ever sorts a whole group's
  * distinct values, so a GLOBAL percentile (empty group list) stays
  * parallel where a plain `Window.orderBy(v)` would be one task.
  * Bucket ids only steer partitioning, never results, so the uniform
  * range split needs no tuning: a skewed bucket degrades parallelism,
  * not correctness.
  *
  * Arithmetic reproduces `Percentile.getPercentile` bit-exactly
  * (position = q * (n-1); keys at floor/ceil position; `(ceil(p) - p)
  * * vLo + (p - floor(p)) * vHi`, the lower key alone when the
  * position is integral), so results hash-match a `percentile()` /
  * DuckDB `quantile_cont` oracle unchanged — the same equivalence
  * already proved on [[Analytics.eventQuantiles]] and
  * [[Relational.shipDelayPercentiles]].
  *
  * NON-NULL assumption on the value column (same caveat as those two):
  * rank positions count only non-null values, so a nullable source
  * needs an IS NOT NULL filter before building the histogram.
  */
object Percentiles {

  /** Interpolated percentiles over `hist(groupCols..., v, cnt)`.
    * Returns one row per group: groupCols ++ one DOUBLE column per
    * (q, name), un-rounded — the caller applies its own round/floor so
    * the downstream arithmetic matches whatever the `percentile()`
    * formulation it replaces did.
    *
    * PERSIST THE INPUT: this plan references `hist` four times (stats
    * join + two bucketed references), so an un-persisted histogram
    * re-expands to a fresh upstream scan per reference (measured: 29
    * events scans / 6.5x runtime in events_mad before its memoCache).
    * The histogram is |distinct values| rows — always cache-cheap.
    */
  def interp(
      hist0: DataFrame,
      groupCols: Seq[String],
      v: String,
      cnt: String,
      qs: Seq[(Double, String)],
      twoLevel: Boolean = true): DataFrame = {
    // uniform code path: a constant synthetic group when none is given
    val global = groupCols.isEmpty
    require(twoLevel || !global,
      "a single-level GLOBAL cumsum is one SinglePartition window over " +
        "every distinct value — use the two-level path for global percentiles")
    val grps = if (global) Seq("_g") else groupCols
    val hist = if (global) hist0.withColumn("_g", lit(0)) else hist0
    val gcols = grps.map(col)

    val cum =
      if (!twoLevel) {
        // single-level: per-group cumsum windows directly over the
        // histogram — 3 fewer stages than the bucketed path. Right when
        // the groups are a bounded enum AND distinct values per group
        // are bounded (2-decimal currency, day counts): one task sorts
        // at most |distinct values| rows regardless of corpus size.
        val byG = Window.partitionBy(gcols: _*)
        hist
          .withColumn("_cum", sum(col(cnt)).over(byG.orderBy(col(v))))
          .withColumn("_n", sum(col(cnt)).over(byG))
      } else {
        val stats = hist.groupBy(gcols: _*).agg(
          sum(col(cnt)).as("_n"),
          min(col(v)).cast("double").as("_vmin"),
          max(col(v)).cast("double").as("_vmax"))
        val bucketed = hist.join(broadcast(stats), grps)
          .withColumn("_bkt",
            when(col("_vmax") <= col("_vmin"), lit(0L))
              .otherwise(least(
                floor((col(v).cast("double") - col("_vmin")) /
                  ((col("_vmax") - col("_vmin")) / 256.0)),
                lit(255L))))
        val bucketTotals = bucketed
          .groupBy((gcols :+ col("_bkt")): _*)
          .agg(sum(col(cnt)).as("_bcnt"))
        // bucket prefix sums over a <=256-rows-per-group frame. Grouped:
        // a window partitioned by the (parallel) group keys. Global: the
        // same window would be one SinglePartition exchange — harmless
        // at 256 rows but exactly the plan shape PlanLintSpec bans, so
        // the prefix sum runs as a broadcast self-join (<=256^2 pairs).
        val offsets =
          if (global) {
            val prior = bucketTotals
              .select(col("_bkt").as("_bkt_p"), col("_bcnt").as("_bcnt_p"))
            bucketTotals
              .join(broadcast(prior), col("_bkt_p") < col("_bkt"), "left")
              .groupBy((gcols :+ col("_bkt")): _*)
              .agg(coalesce(sum(col("_bcnt_p")), lit(0L)).as("_off"))
          } else {
            val offW = Window.partitionBy(gcols: _*).orderBy(col("_bkt"))
              .rowsBetween(Window.unboundedPreceding, -1)
            bucketTotals
              .withColumn("_off", coalesce(sum(col("_bcnt")).over(offW), lit(0L)))
              .select((gcols :+ col("_bkt") :+ col("_off")): _*)
          }
        val cumW = Window.partitionBy((gcols :+ col("_bkt")): _*).orderBy(col(v))
        bucketed.join(broadcast(offsets), grps :+ "_bkt")
          .withColumn("_cum", col("_off") + sum(col(cnt)).over(cumW))
      }

    def pos(q: Double) = lit(q) * (col("_n") - 1).cast("double")
    val picks = qs.flatMap { case (q, name) =>
      Seq(
        min(when(col("_cum") >= floor(pos(q)).cast("long") + 1, col(v)))
          .as(s"_${name}_lo"),
        min(when(col("_cum") >= ceil(pos(q)).cast("long") + 1, col(v)))
          .as(s"_${name}_hi"))
    }
    val picked = cum.groupBy(gcols: _*)
      .agg(max(col("_n")).as("_n"), picks: _*)
    val outQs = qs.map { case (q, name) =>
      val p = pos(q)
      val vLo = col(s"_${name}_lo").cast("double")
      val vHi = col(s"_${name}_hi").cast("double")
      when(floor(p) === ceil(p), vLo)
        .otherwise((ceil(p) - p) * vLo + (p - floor(p)) * vHi)
        .as(name)
    }
    val outCols = (if (global) Nil else gcols) ++ outQs
    picked.select(outCols: _*)
  }
}
