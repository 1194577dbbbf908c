package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway matched-layout shuffle attribution for q_seq_pairs (tooling). */
object SeqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    val shuffleRecs = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          shuffleBytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          shuffleRecs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          ()
        }
      }
    })
    def drain(): Unit = org.apache.spark.graftbus.drain(spark.sparkContext)
    def measure(tag: String)(f: => Unit): Unit = {
      drain(); val s0 = shuffleBytes.get(); val r0 = shuffleRecs.get()
      f
      drain(); val s1 = shuffleBytes.get(); val r1 = shuffleRecs.get()
      println(f"STAGE $tag%-24s shuffle_mb=${(s1 - s0) / 1e6}%.2f recs=${r1 - r0}")
    }

    val base32 = "/root/repo/target/scaleprobe/events_base32.parquet"
    spark.read.parquet("/root/testdata/sf0.1/events.parquet")
      .repartition(32).write.mode("overwrite").parquet(base32)

    for ((tag, src) <- Seq(
        "base" -> "/root/testdata/sf0.1/events.parquet",
        "base32" -> base32,
        "rep" -> "/root/repo/target/scaleprobe/sf0.5/events.parquet")) {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(src)
      val df = raw.schema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case org.apache.spark.sql.types.TimestampNTZType =>
          raw.withColumn("ts", col("ts").cast("timestamp"))
        case _ => raw
      }
      val spans = df
        .select(col("user_id").as("_e"), col("event_type").as("_t"),
          unix_micros(col("ts")).as("_ts"))
        .groupBy(col("_e"), col("_t"))
        .agg(min(col("_ts")).as("_lo"), max(col("_ts")).as("_hi"))
      def noop(d: org.apache.spark.sql.DataFrame): Unit =
        d.write.format("noop").mode("overwrite").save()
      measure(s"$tag/spans")(noop(spans))
      measure(s"$tag/full") {
        noop(graft.operators.Stats.seqPairSupport(
          df, col("user_id"), col("event_type"), unix_micros(col("ts"))))
      }
    }
    spark.stop()
  }
}
