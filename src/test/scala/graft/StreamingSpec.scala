package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode
import graft.streaming.EventStreams
import graft.streaming.EventStreams.RawEvent

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ns(sec: Long): Long = sec * 1000000000L

  test("streaming hourly agg matches batch semantics") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val q = EventStreams.hourly(input.toDF())
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        RawEvent(1, ns(3600), 1, "click", 1.5),
        RawEvent(2, ns(3700), 2, "click", 2.5),
        RawEvent(3, ns(7300), 1, "view", 4.0))
      q.processAllAvailable()
      val got = spark.table("hourly_out").collect()
        .map(r => (r.getAs[Long]("hour_sec"), r.getAs[String]("event_type"),
          r.getAs[Long]("n_events"), r.getAs[Double]("sum_value"))).toSet
      assert(got === Set((3600L, "click", 2L, 4.0), (7200L, "view", 1L, 4.0)))
    } finally q.stop()
  }

  test("file-source streaming hourly agg equals the batch operator") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val batch = graft.Graft.events(spark, "/root/testdata/sf0.001")
    batch.write.mode("overwrite").parquet(dir)
    // Update mode may emit a window more than once; tag rows with their
    // micro-batch id and keep the latest per key (last() over an
    // unordered table is partition-order dependent)
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, Long, String, Long, Double)]
    val q = EventStreams.hourly(
      graft.streaming.EventStreams.fromParquetDir(spark, dir, batch))
      .writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val rows = df.collect().map(r =>
          (batchId, r.getAs[Long]("hour_sec"), r.getAs[String]("event_type"),
            r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val streamed = emitted.synchronized {
        emitted.groupBy(t => (t._2, t._3))
          .map { case (_, rows) => rows.maxBy(_._1) }
          .map(t => (t._2, t._3, t._4, t._5)).toSet
      }
      val batchRes = graft.operators.Events.hourly(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed === batchRes)
    } finally q.stop()
  }

  test("streaming sliding windows equal the batch sliding operator") {
    val dir = java.nio.file.Files.createTempDirectory("graft-slide").toString
    val batch = graft.Graft.events(spark, "/root/testdata/sf0.001")
    batch.write.mode("overwrite").parquet(dir)
    // Update mode re-emits a window whenever it changes; tag every row
    // with its micro-batch id and keep the row from the LATEST batch per
    // key — last() over an unordered collect is partition-order
    // dependent and can pick a stale intermediate update
    val emitted = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, Long, Long, Double)]
    val q = EventStreams.sliding(
      EventStreams.fromParquetDir(spark, dir, batch))
      .writeStream
      .outputMode(OutputMode.Update())
      .foreachBatch { (df: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val rows = df.collect().map(r =>
          (batchId, r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
        emitted.synchronized { emitted ++= rows }
        ()
      }
      .start()
    try {
      q.processAllAvailable()
      val streamed = emitted.synchronized {
        emitted.groupBy(t => (t._2, t._3))
          .map { case (_, rows) => rows.maxBy(_._1) }
          .map(t => (t._2, t._3, t._4, t._5)).toSet
      }
      val batchRes = graft.operators.Analytics.slidingCounts(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
      assert(streamed === batchRes)
    } finally q.stop()
  }

  test("streaming transitions match the batch transition counts") {
    implicit val sqlCtx = spark.sqlContext
    val raw = graft.Graft.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[RawEvent].collect()
    val input = MemoryStream[RawEvent]
    val q = EventStreams.transitions(input.toDS())
      .writeStream.format("memory").queryName("transitions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(raw.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("transitions_out")
        .groupBy("from_type", "to_type")
        .count().collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      val batch = graft.operators.Analytics.eventTransitions(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getAs[String]("from_type"), r.getAs[String]("to_type")) ->
          r.getAs[Long]("n")).toMap
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming EWMA matches the batch smoothed values (single batch)") {
    implicit val sqlCtx = spark.sqlContext
    val raw = graft.Graft.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[RawEvent].collect()
    val input = MemoryStream[RawEvent]
    val q = EventStreams.ewmaHourly(input.toDS())
      .writeStream.format("memory").queryName("ewma_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(raw.toSeq)
      q.processAllAvailable()
      val batch = graft.operators.Analytics.ewmaHourly(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getString(0), r.getAs[Long]("hour")) -> r.getAs[Long]("ewma_x128"))
        .toMap
      // per-type grid end: streaming also emits trailing hours past the
      // batch grid (their windows are nonzero) — compare on grid hours
      val h1 = batch.keys.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val streamed = spark.table("ewma_out").collect()
        .map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2))
        .filter { case ((t, h), _) => h <= h1(t) }.toMap
      // batch emits 0-valued rows inside >8h activity gaps; streaming
      // only re-emits touched (nonzero-window) hours
      assert(streamed === batch.filter(_._2 > 0L))
    } finally q.stop()
  }

  test("streaming EWMA: tolerated late buckets re-emit complete windows; 8h+ late are dropped") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val q = EventStreams.ewmaHourly(input.toDS())
      .writeStream.format("memory").queryName("ewma_late")
      .outputMode(OutputMode.Update()).start()
    def rows() = spark.table("ewma_late").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    try {
      input.addData(RawEvent(1, ns(100L * 3600), 1, "t", 1.0))
      q.processAllAvailable()
      input.addData(RawEvent(2, ns(110L * 3600), 1, "t", 1.0))
      q.processAllAvailable()
      val before = rows().length
      // hour 101 arrives 9h behind newest (110): dropped — settled hours
      // must NOT be overwritten from a partially-evicted window
      input.addData(RawEvent(3, ns(101L * 3600), 1, "t", 1.0))
      q.processAllAvailable()
      assert(rows().length === before, "an 8h+ late bucket must not emit")
      // hour 104 arrives 6h behind: tolerated, and its re-emits include
      // the hour-100 tap (retention is 2x taps, windows stay complete)
      input.addData(RawEvent(4, ns(104L * 3600), 1, "t", 1.0))
      q.processAllAvailable()
      val latest = rows().map { case (t, h, v) => (t, h) -> v }.toMap // last emit wins
      assert(latest(("t", 104L)) === 136L) // 128*(h104) + 8*(h100, 4 taps back)
      assert(latest(("t", 110L)) === 130L) // 128*(h110) + 2*(h104, 6 taps back)
      assert(latest(("t", 101L)) === 64L)  // settled emit untouched by the dropped bucket
    } finally q.stop()
  }

  test("transitions: a >1h event-time gap across batches expires state — no cross-gap pair") {
    import graft.streaming.EventStreams.TransitionOut
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val q = EventStreams.transitions(input.toDS())
      .writeStream.format("memory").queryName("transitions_gap")
      .outputMode(OutputMode.Append()).start()
    try {
      // t0 = 1000s, not 0: a row at event time == the initial watermark
      // (epoch 0) is dropped as late by the stateful operator's filter
      input.addData(RawEvent(1, ns(1000), 1, "click", 1.0), RawEvent(2, ns(1100), 1, "view", 1.0))
      q.processAllAvailable()
      // another user's event 5.5h later advances the watermark (max event
      // time - 1h = 17400s) past user 1's timeout timestamp (1100s + 1h)
      input.addData(RawEvent(3, ns(21000), 2, "click", 1.0))
      q.processAllAvailable()
      // the timeout fires in a batch where user 1 has no data of its own
      input.addData(RawEvent(4, ns(21001), 2, "view", 1.0))
      q.processAllAvailable()
      // user 1 returns after the expired gap: fresh state, NO pair emitted
      input.addData(RawEvent(5, ns(21100), 1, "purchase", 1.0))
      q.processAllAvailable()

      val streamed = spark.table("transitions_gap").as[TransitionOut].collect().toSet
      assert(streamed === Set(
        TransitionOut(1, "click", "view"), TransitionOut(2, "click", "view")))

      // the batch twin pairs across ANY gap via lead(): on the same five
      // rows it ALSO emits user 1's cross-gap (view -> purchase) pair —
      // exactly the divergence the operator docstring documents
      val batchPairs = Seq((1L, 1000L, "click"), (1L, 1100L, "view"),
          (2L, 21000L, "click"), (2L, 21001L, "view"), (1L, 21100L, "purchase"))
        .toDF("user_id", "sec", "event_type")
        .selectExpr("user_id", "event_type AS from_type",
          "lead(event_type) OVER (PARTITION BY user_id ORDER BY sec) AS to_type")
        .where("to_type IS NOT NULL")
        .as[TransitionOut].collect().toSet
      assert(batchPairs -- streamed === Set(TransitionOut(1, "view", "purchase")))
    } finally q.stop()
  }

  test("streaming restart from checkpoint resumes exactly-once") {
    val srcDir = java.nio.file.Files.createTempDirectory("graft-ckpt-src").toString
    val ckpt = java.nio.file.Files.createTempDirectory("graft-ckpt").toString
    val batch = graft.Graft.events(spark, "/root/testdata/sf0.001")
    // split by TIME, not id: the recovered watermark would drop a
    // second half that replays old timestamps as late data
    val mid = batch.selectExpr("percentile(ts, 0.5)").head().getDouble(0).toLong
    val (first, second) = (batch.filter($"ts" <= mid), batch.filter($"ts" > mid))
    first.write.mode("append").parquet(srcDir)

    // memory sinks cannot recover; foreachBatch + batch-id-versioned
    // parquet is the supported recovery path (replayed batch ids simply
    // re-append and the reader takes the latest emission per key)
    val outDir = java.nio.file.Files.createTempDirectory("graft-ckpt-out").toString
    def start() = EventStreams.hourly(
      EventStreams.fromParquetDir(spark, srcDir, batch))
      .writeStream
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, id: Long) =>
        df.withColumn("batch_id", org.apache.spark.sql.functions.lit(id))
          .write.mode("append").parquet(outDir); ()
      }
      .option("checkpointLocation", ckpt)
      .outputMode(OutputMode.Update()).start()

    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    // new files arrive while the query is down; restart from checkpoint
    second.write.mode("append").parquet(srcDir)
    val q2 = start()
    try {
      q2.processAllAvailable()
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"hour_sec", $"event_type")
        .orderBy($"batch_id".desc)
      val streamed = spark.read.parquet(outDir)
        .withColumn("rn", org.apache.spark.sql.functions.row_number().over(w))
        .filter($"rn" === 1)
        .collect().map(r => (r.getAs[Long]("hour_sec"), r.getAs[String]("event_type")) ->
          r.getAs[Long]("n_events")).toMap
      val batchRes = graft.operators.Events.hourly(spark, "/root/testdata/sf0.001")
        .collect().map(r => (r.getAs[Long]("hour_sec"), r.getAs[String]("event_type")) ->
          r.getAs[Long]("n_events")).toMap
      assert(streamed === batchRes) // no loss, no double counting across the restart
    } finally q2.stop()
  }

  test("streaming sessionization matches batch sessions (closed ones)") {
    implicit val sqlCtx = spark.sqlContext
    val raw = graft.Graft.events(spark, "/root/testdata/sf0.001")
      .selectExpr("event_id", "ts", "user_id", "event_type", "value")
      .as[RawEvent].collect()
    val input = MemoryStream[RawEvent]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_batch_parity")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(raw.toSeq)
      q.processAllAvailable()
      val streamed = spark.table("sessions_batch_parity")
        .as[EventStreams.SessionOut].collect()
        .map(s => (s.user_id, s.start_sec, s.end_sec, s.n_events,
          math.rint(s.sum_value * 100) / 100)).toSet
      val batch = graft.operators.Events.sessionize(spark, "/root/testdata/sf0.001")
        .collect()
        .map(r => (r.getAs[Long]("user_id"), r.getAs[Long]("start_sec"),
          r.getAs[Long]("end_sec"), r.getAs[Long]("n_events"), r.getAs[Double]("sum_value")))
      // the stream emits a session when the next event closes it, or when
      // the event-time timeout fires (watermark = max event time - 1h);
      // each user's final session stays open unless it aged past that.
      val lastStart = batch.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      val watermark = raw.map(_.ts / 1000000000L).max - 3600L
      val expected = batch.filter(s =>
        lastStart(s._1) != s._2 || s._3 + 1800L <= watermark).toSet
      assert(streamed === expected)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("streaming top-k per key tracks the batch top-k across batches") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val q = EventStreams.topKPerKey(input.toDS(), k = 2)
      .writeStream.format("memory").queryName("topk_out")
      .outputMode(OutputMode.Update()).start()
    try {
      input.addData(
        RawEvent(1, ns(10), 1, "click", 5.0),
        RawEvent(2, ns(20), 1, "click", 9.0),
        RawEvent(3, ns(30), 1, "view", 1.0))
      q.processAllAvailable()
      input.addData(RawEvent(4, ns(40), 1, "click", 7.0)) // displaces id 1
      q.processAllAvailable()
      input.addData(RawEvent(5, ns(50), 1, "click", 0.5)) // below top-2: no emit
      q.processAllAvailable()
      // last emitted state per (event_type, rank) is the live top-k
      val live = spark.table("topk_out").collect()
        .map(r => (r.getString(0), r.getLong(3)) -> r.getLong(1))
        .groupBy(_._1).map { case (k2, vs) => k2 -> vs.last._2 }
      assert(live(("click", 1L)) === 2L) // 9.0
      assert(live(("click", 2L)) === 4L) // 7.0
      assert(live(("view", 1L)) === 3L)
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered event ids") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val q = EventStreams.dedupById(input.toDF())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        RawEvent(1, ns(1000), 1, "click", 1.0),
        RawEvent(1, ns(1000), 1, "click", 1.0), // duplicate delivery
        RawEvent(2, ns(1100), 1, "view", 2.0))
      q.processAllAvailable()
      input.addData(RawEvent(1, ns(1000), 1, "click", 1.0)) // late replay
      q.processAllAvailable()
      val ids = spark.table("dedup_out").collect().map(_.getAs[Long]("event_id")).toSeq
      assert(ids.sorted === Seq(1L, 2L))
    } finally q.stop()
  }

  test("stream-stream attribution joins purchases to preceding clicks") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val q = EventStreams.clickAttribution(input.toDF())
      .writeStream.format("memory").queryName("attrib_out")
      .outputMode(OutputMode.Append()).start()
    try {
      input.addData(
        RawEvent(10, ns(1000), 1, "click", 0.0),    // within 30 min
        RawEvent(11, ns(2500), 1, "click", 0.0),    // within 30 min
        RawEvent(12, ns(100), 2, "click", 0.0),     // other user
        RawEvent(13, ns(500), 1, "click", 0.0),     // > 30 min before? no: 2800-500=2300s > 1800 -> excluded
        RawEvent(20, ns(2800), 1, "purchase", 9.99))
      q.processAllAvailable()
      val got = spark.table("attrib_out").collect()
        .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
      assert(got === Set((20L, 10L), (20L, 11L)))
    } finally q.stop()
  }

  test("streaming chunk batches maintain the index via foreachBatch upsert") {
    import org.apache.spark.sql.functions._
    implicit val sqlCtx = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft-stream-index").toString
    // generation 0: initial index from the real corpus
    val (m0, c0) = graft.operators.IndexBuilder.build(spark, "/root/testdata/sf0.001")
    m0.write.parquet(s"$base/v0/main")
    c0.write.parquet(s"$base/v0/chunks")
    val n0 = m0.count()

    def unit(axis: Int): Array[Float] = {
      val a = new Array[Float](graft.operators.SemanticSearch.Dim); a(axis) = 1.0f; a
    }
    // stream of (doc_key, chunk_id, embedding) chunk batches
    val input = MemoryStream[(Int, Long, Array[Float])]
    val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    val q = input.toDF().toDF("doc_key", "chunk_id", "embedding")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        if (!batch.isEmpty) {
          val g = gen.get()
          graft.operators.IndexBuilder.upsert(
            spark, s"$base/v$g", batch, s"$base/v${g + 1}")
          gen.incrementAndGet()
          ()
        }
      }
      .start()
    try {
      input.addData((900, 9000L, unit(2)))   // new doc
      q.processAllAvailable()
      input.addData((900, 9001L, unit(3)))   // replace it in the next generation
      q.processAllAvailable()
      assert(gen.get() === 2)
      val m2 = spark.read.parquet(s"$base/v2/main")
      assert(m2.count() === n0 + 1)
      val d900 = m2.filter(col("doc_key") === 900).collect().head
      assert(d900.getAs[Long]("n_chunks") === 1L)
      // latest generation reflects the LAST upsert (axis-3 unit vector)
      assert(d900.getAs[scala.collection.Seq[Double]]("doc_vec")(3) === 1.0)
    } finally q.stop()
  }

  test("streaming sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[RawEvent]
    val q = EventStreams.sessionize(input.toDS())
      .writeStream.format("memory").queryName("sessions_out")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1: two events 10 min apart (one session), then a third 2h
      // later -> first session closes when the third arrives.
      input.addData(RawEvent(1, ns(1000), 1, "click", 1.0),
        RawEvent(2, ns(1600), 1, "click", 2.0))
      q.processAllAvailable()
      input.addData(RawEvent(3, ns(9000), 1, "click", 4.0))
      q.processAllAvailable()
      val got = spark.table("sessions_out").as[EventStreams.SessionOut].collect()
      assert(got.toSeq === Seq(EventStreams.SessionOut(1L, 1000L, 1600L, 2L, 3.0)))
    } finally q.stop()
  }
}
