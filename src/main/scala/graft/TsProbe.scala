package graft

import org.apache.spark.sql.SparkSession

/** Throwaway plan/shuffle check for q_trend_theilsen (tooling). */
object TsProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
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
    val df = SparkEntry.queries("q_trend_theilsen")(spark, "/root/testdata/sf0.1")
    df.write.format("noop").mode("overwrite").save()
    org.apache.spark.graftbus.drain(spark.sparkContext)
    println(f"THEILSEN shuffle_mb=${shuffleBytes.get() / 1e6}%.1f")
    println(df.queryExecution.executedPlan.toString.take(6000))
    spark.stop()
  }
}
