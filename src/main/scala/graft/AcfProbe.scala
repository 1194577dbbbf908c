package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway per-stage shuffle attribution for the hourly-ACF pipeline
  * (q_dominant_period / q_pacf matched-layout recs ran 10x on 5x data
  * while q_acf ran exactly 5x — find the stage that doubles; tooling). */
object AcfProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val recs = new java.util.concurrent.atomic.AtomicLong(0L)
    val bytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onTaskEnd(t: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        val m = t.taskMetrics
        if (m != null) {
          recs.addAndGet(m.shuffleReadMetrics.recordsRead)
          recs.addAndGet(m.shuffleWriteMetrics.recordsWritten)
          bytes.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          bytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          ()
        }
      }
    })
    def drain(): Unit = org.apache.spark.graftbus.drain(spark.sparkContext)

    val startUs = 1704067200000000L
    def hourly(dir: String) = graft.sources.Tables.events(spark, dir)
      .select(col("user_id").as("g"),
        floor((unix_micros(col("ts")) - startUs) / 3600000000.0)
          .cast("long").as("x"),
        floor(col("value") * 1000).cast("long").as("m"))
      .groupBy(col("g"), col("x")).agg(sum(col("m")).as("y"))

    def stage(name: String, dir: String)(f: String => org.apache.spark.sql.DataFrame): Unit = {
      f(dir).write.format("noop").mode("overwrite").save() // warm
      drain(); val r0 = recs.get(); val b0 = bytes.get()
      f(dir).write.format("noop").mode("overwrite").save()
      drain()
      println(f"$name,$dir,recs=${recs.get() - r0},mb=${(bytes.get() - b0) / 1e6}%.1f")
    }

    val b32 = "/root/repo/target/scaleprobe/sf0.1b32"
    val rep = "/root/repo/target/scaleprobe/sf0.5"
    for (dir <- Seq(b32, rep)) {
      stage("hourly_agg", dir)(d => hourly(d))
      stage("acf_full", dir)(d =>
        graft.operators.TimeSeries.acfPpm(hourly(d),
          col("g"), col("x"), col("x"), col("y"), maxLag = 6))
    }
    println("=== plan at b32 ===")
    println(graft.operators.TimeSeries.acfPpm(hourly(b32),
      col("g"), col("x"), col("x"), col("y"), maxLag = 6)
      .queryExecution.executedPlan.toString.take(4000))
    println("=== plan at rep ===")
    println(graft.operators.TimeSeries.acfPpm(hourly(rep),
      col("g"), col("x"), col("x"), col("y"), maxLag = 6)
      .queryExecution.executedPlan.toString.take(4000))
    spark.stop()
  }
}
