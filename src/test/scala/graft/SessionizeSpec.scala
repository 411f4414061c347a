package graft

import org.apache.spark.sql.functions._

import graft.operators.Sessionize
import graft.streaming.StreamingAgg

/** Batch sessionization — including the equivalence that matters: the
  * window-based batch pass and the flatMapGroupsWithState streaming pass
  * assign the SAME sessions to the same event log. */
class SessionizeSpec extends SparkSpec {
  import spark.implicits._

  test("assignSessions splits on gap, 0-based per key, tie-stable") {
    val df = Seq(
      (1L, 10L, 0L), (1L, 11L, 50L), (1L, 12L, 200L), // gap 100 → split
      (2L, 20L, 0L), (2L, 21L, 0L) // equal ts: tie broken by id, same session
    ).toDF("k", "id", "t")
    val got = Sessionize.assignSessions(df, "k", "t", "id", gapUs = 100L)
      .select("k", "id", "session").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got((1L, 10L)) === 0L && got((1L, 11L)) === 0L)
    assert(got((1L, 12L)) === 1L)
    assert(got((2L, 20L)) === 0L && got((2L, 21L)) === 0L)
  }

  test("batch sessions match the streaming sessionizer on the fixture") {
    val gapMs = 30L * 60 * 1000
    val raw = Tables.events(spark, sf0001)
      .filter(pmod(col("user_id"), lit(5L)) === 1)
    // streaming path (run in batch mode: same fold, NoTimeout)
    val streamed = StreamingAgg.sessionize(
        raw.select(col("event_id"), col("ts"), col("user_id"),
          col("event_type"), col("value")).as[StreamingAgg.Event],
        gapMillis = gapMs)
      .collect()
      .map(s => (s.user_id, s.session_start.getTime, s.session_end.getTime,
        s.n_events))
      .toSet
    // batch window path at millisecond granularity to match Timestamp.getTime
    val batch = Sessionize.sessions(
        raw.select(col("user_id"), col("event_id"),
          (unix_micros(col("ts")) / 1000L).cast("long").as("ts_ms")),
        "user_id", "ts_ms", "event_id", gapUs = gapMs)
      .collect()
      .map(r => (r.getLong(0), r.getLong(3), r.getLong(4), r.getLong(2)))
      .toSet
    assert(batch === streamed)
    assert(batch.nonEmpty)
  }
}
