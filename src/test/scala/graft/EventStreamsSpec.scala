package graft

import graft.streaming.EventStreams
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

class EventStreamsSpec extends SparkSpec {
  import SparkSpec.spark.implicits._

  private val eventsSchema = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  // FileStreamSource wants a directory; stage the single-file table
  private lazy val eventsDir: String = {
    val d = java.nio.file.Files.createTempDirectory("graft-events-stream")
    java.nio.file.Files.copy(java.nio.file.Paths.get(s"$sf/events.parquet"),
      d.resolve("events.parquet"))
    d.toString
  }

  test("windowed aggregation over the events stream matches batch totals") {
    // stream the sf0.001 events parquet as a file stream
    val stream = spark.readStream.schema(eventsSchema)
      .parquet(eventsDir)
    val agg = EventStreams.windowedAgg(stream)
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      // append mode only emits closed windows; advance the watermark by
      // processing availability — the parquet is finite, so compare
      // totals via the update-mode complete run instead:
    } finally q.stop()

    val q2 = EventStreams.windowedAgg(stream)
      .writeStream.outputMode("complete").format("memory").queryName("win_all").start()
    try {
      q2.processAllAvailable()
      val streamed = spark.sql("SELECT sum(n_events) FROM win_all").head().getLong(0)
      val batch = spark.read.parquet(s"$sf/events.parquet").count()
      assert(streamed == batch)
      // windows are 5 minutes and keyed by event_type
      val row = spark.sql("SELECT * FROM win_all").head()
      assert(row.schema.fieldNames.contains("window"))
    } finally q2.stop()
  }

  test("stateful per-user cursor tracks last event and totals") {
    val stream = spark.readStream.schema(eventsSchema)
      .parquet(eventsDir)
      .select(col("user_id"), col("event_id"), col("ts"), col("value"))
      .as[EventStreams.EventRow]
    val q = EventStreams.userCursor(stream)
      .writeStream.outputMode("append").format("memory").queryName("cursor_out").start()
    try {
      q.processAllAvailable()
      val cursors = spark.sql(
        "SELECT user_id, last_event_id, n_events, total_value FROM cursor_out").collect()
      assert(cursors.nonEmpty)
      // compare against batch ground truth per user
      val batch = spark.read.parquet(eventsDir)
        .groupBy("user_id")
        .agg(max_by(col("event_id"), col("ts")).as("last_event_id"),
          count(lit(1)).as("n"), sum("value").as("total"))
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
      cursors.foreach { r =>
        val (lastId, n, total) = batch(r.getLong(0))
        assert(r.getLong(1) == lastId, s"user ${r.getLong(0)} last_event_id")
        assert(r.getLong(2) == n)
        assert(math.abs(r.getDouble(3) - total) < 1e-6)
      }
      assert(cursors.length == batch.size)
    } finally q.stop()
  }
}
