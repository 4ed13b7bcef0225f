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

  test("file-source streaming reads the events table incrementally") {
    val dir = java.nio.file.Files.createTempDirectory("graft-stream").toString
    val batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    batch.limit(100).write.mode("overwrite").parquet(dir)
    val q = EventStreams.hourly(
      graft.streaming.EventStreams.fromParquetDir(spark, dir, batch))
      .writeStream.format("memory").queryName("file_hourly")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("file_hourly").count() > 0)
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
