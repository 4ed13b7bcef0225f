package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming twins of graft.operators.Events: the same hourly
  * tumbling aggregation and gap sessionization, expressed as an unbounded
  * stream with watermarks and typed state.
  *
  * Scale notes: hourly is a streaming partial aggregation (state =
  * per-window per-type sums, bounded by the watermark horizon);
  * sessionize keeps one open-session state object per active user and
  * emits sessions as they close — state size is O(active users), not
  * O(events).
  */
object EventStreams {

  /** Raw event row as produced by the testdata schema (ts in long
    * nanoseconds, like the batch reader sees it).
    */
  case class RawEvent(event_id: Long, ts: Long, user_id: Long, event_type: String, value: Double)

  case class SessionOut(user_id: Long, start_sec: Long, end_sec: Long, n_events: Long, sum_value: Double)

  /** Open-session state (public: Spark codegen must reach the accessors). */
  case class SessionState(start: Long, last: Long, n: Long, total: Double)

  /** Normalize a raw stream: nanosecond long -> event-time timestamp. */
  def withEventTime(events: DataFrame): DataFrame =
    events.withColumn("event_time", timestamp_seconds(expr("ts div 1000000000")))

  /** Tumbling 1-hour windowed count+sum per event type, 2h watermark.
    * Batch twin: graft.operators.Events.hourly.
    */
  def hourly(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("hour_sec"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding 1-hour windows every 15 minutes per event type, 2h
    * watermark — each event updates its 4 overlapping windows; state is
    * bounded by (open windows x types). Batch twin:
    * graft.operators.Analytics.slidingCounts.
    */
  def sliding(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "2 hours")
      .groupBy(window(col("event_time"), "1 hour", "15 minutes"), col("event_type"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("sum_value"))
      .select(col("event_type"), unix_timestamp(col("window.start")).as("wstart"),
        col("n"), col("sum_value"))

  /** Gap-based sessionization (30-min inactivity) with typed per-user
    * state via flatMapGroupsWithState. Emits a session when a new event
    * arrives more than `gapSec` after the last one, or when the user's
    * state times out. Batch twin: graft.operators.Events.sessionize.
    */
  def sessionize(events: Dataset[RawEvent], gapSec: Long = 1800): Dataset[SessionOut] = {
    import events.sparkSession.implicits._

    def fold(userId: Long, it: Iterator[RawEvent],
             state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        val out = state.getOption.map(st =>
          SessionOut(userId, st.start, st.last, st.n, st.total)).iterator
        state.remove()
        return out
      }
      val secs = it.map(e => (e.ts / 1000000000L, e.value)).toArray.sortBy(_._1)
      var st = state.getOption.orNull
      val closed = Vector.newBuilder[SessionOut]
      secs.foreach { case (sec, v) =>
        st match {
          case null => st = SessionState(sec, sec, 1, v)
          case prev if sec - prev.last > gapSec =>
            closed += SessionOut(userId, prev.start, prev.last, prev.n, prev.total)
            st = SessionState(sec, sec, 1, v)
          case prev =>
            st = SessionState(prev.start, sec, prev.n + 1, prev.total + v)
        }
      }
      if (st != null) {
        state.update(st)
        state.setTimeoutTimestamp(st.last * 1000L + gapSec * 1000L)
      }
      closed.result().iterator
    }

    events
      .withColumn("event_time", timestamp_seconds(expr("ts div 1000000000")))
      .withWatermark("event_time", "1 hour")
      .as[RawEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Last-seen event per user (streaming transition state). */
  case class LastEvent(ts: Long, eventId: Long, eventType: String)

  case class TransitionOut(user_id: Long, from_type: String, to_type: String)

  /** Streaming first-order transitions: one LastEvent state per user;
    * each arriving event emits the (previous -> current) pair and
    * becomes the new state. State for a user idle past the 1h watermark
    * horizon is expired via EventTimeTimeout (same policy as
    * [[sessionize]]), so retained state is bounded by ACTIVE users, not
    * all users ever seen. Batch twin: Analytics.eventTransitions —
    * identical pair stream when fed the same rows in event-time order
    * AND no per-user event-time gap exceeds the 1h expiry horizon
    * across micro-batches: a user's first event after an expired gap
    * starts fresh (no cross-gap pair), where the batch twin pairs
    * across any gap via lead(). That is the price of bounded state —
    * the spec's expiry test documents the divergence explicitly.
    * Late-data caveat: an event arriving in a later micro-batch (but
    * inside the watermark) pairs in ARRIVAL order, which can diverge
    * from the batch twin's global event-time order — the spec feeds one
    * batch per event-time window, documenting the contract.
    */
  def transitions(events: Dataset[RawEvent]): Dataset[TransitionOut] = {
    import events.sparkSession.implicits._

    def fold(userId: Long, it: Iterator[RawEvent],
             state: GroupState[LastEvent]): Iterator[TransitionOut] = {
      if (state.hasTimedOut) {
        state.remove()
        Iterator.empty
      } else {
        val ordered = it.toArray.sortBy(e => (e.ts, e.event_id))
        var last = state.getOption.orNull
        val out = Vector.newBuilder[TransitionOut]
        ordered.foreach { e =>
          if (last != null) out += TransitionOut(userId, last.eventType, e.event_type)
          last = LastEvent(e.ts, e.event_id, e.event_type)
        }
        if (last != null) {
          state.update(last)
          // expire an hour of event time past the last event; clamp above
          // the current watermark (timeouts in the past are rejected)
          state.setTimeoutTimestamp(math.max(
            last.ts / 1000000000L * 1000L + 3600L * 1000L,
            state.getCurrentWatermarkMs() + 1000L))
        }
        out.result().iterator
      }
    }

    events
      .withColumn("event_time", timestamp_seconds(expr("ts div 1000000000")))
      .withWatermark("event_time", "1 hour")
      .as[RawEvent]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.EventTimeTimeout())(fold)
  }

  /** Rolling per-type hourly counts (streaming EWMA state): the last 16
    * hour buckets — twice the tap count, so that ANY hour a tolerated
    * (< 8 h late) arrival can touch still has its full 8-tap window in
    * state and every re-emit is complete, never partial.
    */
  case class EwmaState(counts: Map[Long, Long])

  case class EwmaOut(event_type: String, hour: Long, ewma_x128: Long)

  /** Streaming EWMA (λ=1/2, 8 taps, zero-padded — the unbounded twin of
    * `Analytics.ewmaHourly`): one state per event type holding the
    * trailing hour→count buckets; every batch updates the touched hour
    * buckets and re-emits the smoothed value for each hour in the
    * affected horizon (Update-mode semantics: downstream keeps the
    * LATEST emit per (type, hour)). State is bounded by construction
    * (≤ 16 buckets per type) no matter how long the stream runs.
    *
    * Lateness contract — the fold's own watermark: a bucket arriving
    * 8+ hours behind the type's newest known bucket is DROPPED, not
    * merged. Hours that old are settled; merging them would re-emit
    * windows whose older taps were already evicted, overwriting correct
    * settled values with undercounts. Within the tolerance, late
    * buckets re-emit COMPLETE windows (retention is 2x the tap count).
    * Batch parity therefore holds for any batch split whose per-type
    * lateness stays under 8 hours: every hour at least 7 hours behind
    * that type's newest bucket ends at exactly the batch operator's
    * value (younger hours re-emit as later batches fill their window) —
    * asserted by `StreamingSpec`, including the late-arrival cases.
    */
  def ewmaHourly(events: Dataset[RawEvent]): Dataset[EwmaOut] = {
    import events.sparkSession.implicits._

    def fold(eventType: String, it: Iterator[RawEvent],
             state: GroupState[EwmaState]): Iterator[EwmaOut] = {
      val arrivedAll = it.toArray.groupBy(_.ts / 1000000000L / 3600L)
        .map { case (h, es) => h -> es.length.toLong }
      val prior = state.getOption.map(_.counts).getOrElse(Map.empty[Long, Long])
      // lateness is measured against the PRIOR state's newest bucket —
      // within one batch there is no lateness (a catch-up batch may
      // legitimately span days); buckets 8+ hours behind what earlier
      // batches established are dropped
      val priorNewest = prior.keys.foldLeft(Long.MinValue)(math.max)
      val arrived = arrivedAll.filter { case (h, _) =>
        prior.isEmpty || h > priorNewest - 8 }
      if (arrived.isEmpty) Iterator.empty
      else {
        // emit from the UNFILTERED merge; the state keeps only the
        // trailing 16 buckets. Every kept arrival is > priorNewest-8 and
        // prior retains > priorNewest-16, so each touched window's taps
        // (>= priorNewest-14) are all present — re-emits are complete.
        val mergedAll = prior ++ arrived.map { case (h, n) =>
          h -> (prior.getOrElse(h, 0L) + n) }
        val newest = mergedAll.keys.max
        state.update(EwmaState(mergedAll.filter { case (h, _) => h > newest - 16 }))
        val touched = arrived.keys.flatMap(h => h until h + 8).toSet
          .filter(th => mergedAll.keys.exists(src => th >= src && th < src + 8))
        touched.toSeq.sorted.iterator.map { th =>
          val v = (0 until 8).map { k =>
            mergedAll.getOrElse(th - k, 0L) * (1L << (7 - k))
          }.sum
          EwmaOut(eventType, th, v)
        }
      }
    }

    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fold)
  }

  /** Streaming exact dedup: drop re-delivered events by id, keeping
    * state only inside the watermark horizon (the unbounded-stream twin
    * of dedup_exact — state is bounded by arrival skew, not stream
    * length). At-least-once sources (Kafka, file replay) need exactly
    * this before any downstream aggregation.
    */
  def dedupById(events: DataFrame): DataFrame =
    withEventTime(events)
      .withWatermark("event_time", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-stream click->purchase attribution: each purchase joins the
    * user's clicks in the preceding 30 minutes — an interval join where
    * BOTH sides are unbounded; the time-range condition plus watermarks
    * bound the join state on each side (the streaming twin of the
    * batch as-of join).
    */
  def clickAttribution(events: DataFrame): DataFrame = {
    val e = withEventTime(events)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_time").as("click_time"))
      .withWatermark("click_time", "1 hour")
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user"), col("event_id").as("purchase_id"),
        col("value"), col("event_time").as("purchase_time"))
      .withWatermark("purchase_time", "1 hour")
    purchases.join(clicks,
      expr("""p_user = c_user AND
             |click_time <= purchase_time AND
             |click_time >= purchase_time - interval 30 minutes""".stripMargin))
      .select(col("p_user").as("user_id"), col("purchase_id"), col("click_id"),
        unix_timestamp(col("purchase_time")).as("purchase_sec"),
        unix_timestamp(col("click_time")).as("click_sec"), col("value"))
  }

  case class TopKItem(event_id: Long, value: Double)
  case class TopKState(items: Seq[TopKItem])
  case class TopKOut(event_type: String, event_id: Long, value: Double, rank: Long)

  /** Streaming per-key top-k by value: the unbounded twin of the batch
    * TopKPerKey plan — a bounded k-item set lives in typed state per
    * key, each micro-batch folds its rows in O(rows · log k)-ish work,
    * and the CURRENT top-k is re-emitted whenever it changes (Update
    * semantics). State is O(k · #keys) regardless of stream length.
    */
  def topKPerKey(events: Dataset[RawEvent], k: Int = 3): Dataset[TopKOut] = {
    import events.sparkSession.implicits._

    def fold(key: String, it: Iterator[RawEvent],
             state: GroupState[TopKState]): Iterator[TopKOut] = {
      val prev = state.getOption.map(_.items).getOrElse(Seq.empty)
      val merged = (prev ++ it.map(e => TopKItem(e.event_id, e.value)))
        .sortBy(x => (-x.value, x.event_id))
        .take(k)
      if (merged == prev) Iterator.empty
      else {
        state.update(TopKState(merged))
        merged.iterator.zipWithIndex.map { case (x, i) =>
          TopKOut(key, x.event_id, x.value, i + 1L)
        }
      }
    }

    events
      .groupByKey(_.event_type)
      .flatMapGroupsWithState(OutputMode.Update(), GroupStateTimeout.NoTimeout())(fold)
  }

  /** File-source entry point: stream the events table from a directory of
    * parquet (the batch table is one file; a production feed would be a
    * growing directory or Kafka source — the plan is identical).
    */
  /** File-source stream over an events parquet dir; `ts` is normalized
    * to epoch-ns long whatever the physical type, like the batch reader.
    */
  def fromParquetDir(spark: SparkSession, dir: String, schemaFrom: DataFrame): DataFrame =
    graft.Graft.nanosTs(spark.readStream.schema(schemaFrom.schema).parquet(dir))
}
