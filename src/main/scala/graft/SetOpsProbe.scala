package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway per-stage shuffle attribution for q_approx_setops (tooling). */
object SetOpsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.autoBroadcastJoinThreshold", "-1")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
    })
    def drain(): Unit = {
      org.apache.spark.graftbus.drain(spark.sparkContext)
    }
    def measure(tag: String)(f: => Unit): Unit = {
      drain(); val s0 = shuffleBytes.get()
      f
      drain(); val s1 = shuffleBytes.get()
      println(f"STAGE $tag%-28s shuffle_mb=${(s1 - s0) / 1e6}%.2f")
    }

    // Matched-layout base: sf0.1 events rewritten to 32 interleaved
    // splits (the replica's layout), so partial-agg state compares
    // growth, not file count.
    val base32 = "/root/repo/target/scaleprobe/events_base32.parquet"
    spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .repartition(32).write.mode("overwrite").parquet(base32)

    for ((tag, dir) <- Seq(
        "base" -> "/root/testdata/sf0.1",
        "base32" -> "BASE32",
        "rep" -> "/root/repo/target/scaleprobe/sf0.5")) {
      val df = if (dir == "BASE32") spark.read.parquet(base32)
        else spark.read.parquet(s"$dir/events.parquet")
      val g = df.groupBy(col("user_id").as("_u"))
        .agg(array_sort(collect_set(col("event_type"))).as("_ts"))
      val ex = g.select(col("_u"), explode(col("_ts")).as("_t"))
      val per = ex.groupBy(col("_t"))
        .agg(count(lit(1)).as("_n"), hll_sketch_agg(col("_u"), lit(12)).as("_sk"))
      def noop(d: org.apache.spark.sql.DataFrame): Unit =
        d.write.format("noop").mode("overwrite").save()
      measure(s"$tag/collect_set")(noop(g))
      measure(s"$tag/hll_agg")(noop(per))
      measure(s"$tag/full") {
        noop(graft.operators.Approx.setOpSketchCheck(df, "event_type", "user_id"))
      }
    }
    spark.stop()
  }
}
