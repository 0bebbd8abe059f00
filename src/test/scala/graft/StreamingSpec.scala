package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming parity of the tumbling-window aggregate
  * (SURVEY.md §2.10 stretch): the same `window()` expression as
  * q_window_tumbling, fed incrementally from the events parquet via
  * readStream + memory sink, must agree with the batch answer. */
class StreamingSpec extends SparkSpec {

  test("streaming tumbling window == batch tumbling window") {
    // events.ts is TIMESTAMP(NANOS) → read as long (nanosAsLong is set on
    // the shared session) and convert exactly like Tables.events.
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ts", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))

    // FileStreamSource requires a directory: stage the single parquet file.
    val dir = java.nio.file.Files.createTempDirectory("graft_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      dir.resolve("events.parquet"))

    val stream = spark.readStream.schema(schema)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("ws"), col("event_type"), col("n"))

    val q = stream.writeStream.outputMode("complete")
      .format("memory").queryName("tumbling_out").start()
    try q.processAllAvailable() finally q.stop()

    val streamed = spark.table("tumbling_out")
      .orderBy("ws", "event_type").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))

    val batch = Tables.events(spark, sf)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").cast("timestamp").as("ws"), col("event_type"), col("n"))
      .orderBy("ws", "event_type").collect()
      .map(r => (r.getTimestamp(0).getTime, r.getString(1), r.getLong(2)))

    assert(streamed.nonEmpty && streamed.sameElements(batch))
  }
}
