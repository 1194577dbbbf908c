package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}

import graft.store.SnapshotStore
import graft.streaming.Replay

class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("windowedReplay over the file store equals the batch aggregation") {
    val events = Seq(
      (1L, ts("2024-01-01 10:15:00"), "a", 1.5),
      (2L, ts("2024-01-01 10:45:00"), "a", 2.5),
      (3L, ts("2024-01-01 11:05:00"), "b", 3.5),
      (4L, ts("2024-01-02 09:00:00"), "a", 4.5)
    ).toDF("id", "ts", "event_type", "value")
    val path = Files.createTempDirectory(
      java.nio.file.Paths.get("/root/repo/target"), "stream").toString
    SnapshotStore.write(events, path, "ts")

    val streamed = Replay.windowedReplay(spark, path, "t_replay", filesPerBatch = 1)
      .orderBy("bucket_us", "event_type")
      .as[(Long, String, Long, Long)].collect().toSeq
    val batch = events
      .groupBy(expr("unix_micros(date_trunc('hour', ts))").as("bucket_us"), $"event_type")
      .agg(count(lit(1)).as("n"), sum(floor($"value" * 1000).cast("long")).as("value_mils"))
      .orderBy("bucket_us", "event_type")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(streamed == batch)
    assert(streamed.map(_._3).sum == 4)
  }

  test("statefulTrajectories accumulates per-key state across micro-batches") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Replay.Obs]
    val sink = "t_traj_state"
    spark.catalog.dropTempView(sink)
    val q = Replay.statefulTrajectories(input.toDS())
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    input.addData(
      Replay.Obs("a", ts("2024-01-01 10:00:00"), 1.0),
      Replay.Obs("a", ts("2024-01-01 11:00:00"), 2.0))
    q.processAllAvailable()
    input.addData(
      Replay.Obs("a", ts("2024-01-01 12:00:00"), 3.0), // advances last
      Replay.Obs("b", ts("2024-01-01 10:30:00"), 9.0))
    q.processAllAvailable()
    q.stop()

    // last Update-mode emission per key reflects the full accumulated state
    val byKey = spark.table(sink).as[Replay.TrajUpdate].collect()
      .groupBy(_.k).map { case (k, us) => k -> us.maxBy(_.n) }
    assert(byKey("a").n == 3 && byKey("a").lastV == 3.0 &&
      byKey("a").first == ts("2024-01-01 10:00:00") &&
      byKey("a").last == ts("2024-01-01 12:00:00"))
    assert(byKey("b").n == 1 && byKey("b").lastV == 9.0)
  }

  test("late data ACROSS micro-batches extends both trajectory bounds") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Replay.Obs]
    val sink = "t_traj_late"
    spark.catalog.dropTempView(sink)
    val q = Replay.statefulTrajectories(input.toDS())
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update)
      .start()
    input.addData(Replay.Obs("k", ts("2024-01-01 12:00:00"), 5.0))
    q.processAllAvailable()
    input.addData(Replay.Obs("k", ts("2024-01-01 09:00:00"), 1.0)) // late, earlier batch
    q.processAllAvailable()
    q.stop()
    val r = spark.table(sink).as[Replay.TrajUpdate].collect().maxBy(_.n)
    assert(r.n == 2 && r.first == ts("2024-01-01 09:00:00") &&
      r.last == ts("2024-01-01 12:00:00") && r.lastV == 5.0)
  }

  test("out-of-order instants within a batch keep the max-ts value as last") {
    implicit val sq = spark.sqlContext
    val input = MemoryStream[Replay.Obs]
    val sink = "t_traj_ooo"
    spark.catalog.dropTempView(sink)
    val q = Replay.statefulTrajectories(input.toDS())
      .writeStream.format("memory").queryName(sink)
      .outputMode(OutputMode.Update)
      .start()
    input.addData(
      Replay.Obs("k", ts("2024-01-01 12:00:00"), 5.0),
      Replay.Obs("k", ts("2024-01-01 10:00:00"), 1.0)) // late within batch
    q.processAllAvailable()
    q.stop()
    val r = spark.table(sink).as[Replay.TrajUpdate].collect().maxBy(_.n)
    assert(r.n == 2 && r.lastV == 5.0 && r.first == ts("2024-01-01 10:00:00"))
  }
}
