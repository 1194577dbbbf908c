package graft

import org.apache.spark.sql.functions._

/** Pins the session_window boundary semantics the q_session_window oracle
  * depends on: a successor's window [t, t+gap) MERGES when it touches the
  * running session's end — an event arriving EXACTLY `gap` after its
  * predecessor still merges, and only `diff > gap` breaks the session
  * (measured on Spark 4.1; mirrored by the oracle's `> gap` predicate).
  * If a Spark upgrade ever flips the merge inequality, this fails loudly
  * instead of the oracle silently diverging. */
class WindowSpec extends SparkSpec {
  import spark.implicits._

  private val GapUs = 7200000000L // 2 hours

  test("session_window: gap-equal spacing merges; gap+1µs starts a new session") {
    val df = Seq(
      (1L, 0L), (1L, GapUs),     // exactly 2h apart → still ONE session
      (2L, 0L), (2L, GapUs + 1L) // 1µs past the gap → two sessions
    ).toDF("user_id", "us").withColumn("ts", expr("timestamp_micros(us)"))
    val sessions = df
      .groupBy($"user_id", session_window($"ts", "2 hours"))
      .agg(count(lit(1)).as("n"))
      .select($"user_id",
        expr("unix_micros(session_window.start)").as("start_us"),
        expr("unix_micros(session_window.end)").as("end_us"),
        $"n")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(sessions == Set(
      (1L, 0L, 2 * GapUs, 2L),
      (2L, 0L, GapUs, 1L),
      (2L, GapUs + 1L, 2 * GapUs + 1L, 1L)))
  }

  test("session_window: duplicate timestamps stay in one session") {
    val df = Seq((1L, 5L), (1L, 5L), (1L, 5L))
      .toDF("user_id", "us").withColumn("ts", expr("timestamp_micros(us)"))
    val sessions = df
      .groupBy($"user_id", session_window($"ts", "2 hours"))
      .agg(count(lit(1)).as("n"))
      .select($"n").as[Long].collect().toSeq
    assert(sessions == Seq(3L))
  }
}
