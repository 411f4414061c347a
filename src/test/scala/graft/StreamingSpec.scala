package graft

import org.apache.spark.sql.functions._

import graft.streaming.StreamingAgg

class StreamingSpec extends SparkSpec {

  test("windowed approx agg over a streamed events fixture tracks the batch answer") {
    val batchEvents = Tables.events(spark, sf0001)
    // stream the same parquet through a file source with one-file batches;
    // schema must be the RAW on-disk schema (ts as long nanos under
    // nanosAsLong), converted after read like Tables.events does
    val rawSchema = spark.read.parquet(Tables.path(sf0001, "events")).schema
    // file-source streaming needs a DIRECTORY; stage the single parquet file
    val dir = java.nio.file.Files.createTempDirectory("events_stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(Tables.path(sf0001, "events")),
      dir.resolve("events.parquet"))
    val streamed = spark.readStream
      .schema(rawSchema)
      .option("maxFilesPerTrigger", 1)
      .parquet(dir.toString)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
    val approx = StreamingAgg.windowedApproxAgg(streamed, "1 hour", step = 5L)
    val got = StreamingAgg.runToMemory(spark, approx, "approx_hourly")

    val exactTotal = batchEvents.agg(sum("value")).head.getDouble(0)
    val estTotal = got.agg(sum("sum_value_est")).head.getDouble(0)
    assert(got.count() > 0, "no windows emitted")
    assert(math.abs(estTotal - exactTotal) / exactTotal < 0.25,
      s"stream estimate $estTotal vs exact $exactTotal")
  }

  test("sessionize closes sessions and sums values") {
    import spark.implicits._
    val evs = Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[StreamingAgg.Event]
    // batch Dataset: mapGroupsWithState over a bounded group works in batch
    // mode too (state machinery identical, no timeouts fire)
    val sessions = StreamingAgg.sessionize(evs, gapMillis = 60 * 60 * 1000L)
    val out = sessions.collect()
    assert(out.nonEmpty)
    assert(out.forall(s => s.n_events > 0))
    assert(out.forall(s => !s.session_end.before(s.session_start)))
  }
}
