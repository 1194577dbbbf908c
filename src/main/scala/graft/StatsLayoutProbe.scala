package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Matched-layout shuffle attribution for the round-9 (type, user)-keyed
  * statistics queries (q_spearman / q_bootstrap_ci / q_survival_km /
  * q_ab_srm) — the q_seq_pairs/SeqProbe differential applied to the new
  * wave: raw ScaleProbe ratios on these read 29-46× because the sf0.1
  * events base lands in ONE parquet split (partial-agg/dedup state
  * pre-collapses to the key-domain size before the exchange), while the
  * 5× replica has 32 splits. Rewriting the base to 32 interleaved
  * splits and re-measuring gives the same-layout ratio — linear ≈ 5×
  * if the partial-state explanation is the whole story. */
object StatsLayoutProbe {
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

    val base = "/root/testdata/sf0.1"
    val rep = "/root/repo/target/scaleprobe/sf0.5"
    ScaleProbe.buildReplica(spark, base, rep, copies = 5)
    // matched-layout base: the sf0.1 events through the SAME replica
    // write pipeline (32 interleaved splits), 1 copy
    val b32 = "/root/repo/target/scaleprobe/sf0.1b32"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$b32/events.parquet"))) {
      graft.sources.Tables.events(spark, base)
        .repartition(32)
        .write.mode("overwrite").parquet(s"$b32/events.parquet")
    }

    val queries = if (args.nonEmpty) args.toSeq
      else Seq("q_spearman", "q_bootstrap_ci", "q_survival_km", "q_ab_srm")
    def run(name: String, dir: String): (Double, Long) = {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save() // warm-up
      drain(); val s0 = shuffleBytes.get(); val r0 = shuffleRecs.get()
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      drain()
      (((shuffleBytes.get() - s0) / 1e5).round / 10.0, shuffleRecs.get() - r0)
    }
    println("query,b32_mb,rep_mb,mb_x,b32_recs,rep_recs,recs_x")
    queries.foreach { q =>
      val (mb1, rc1) = run(q, b32)
      val (mb5, rc5) = run(q, rep)
      def x(a: Double, b: Double) = if (a > 0) ((b / a) * 10).round / 10.0 else -1.0
      println(s"$q,$mb1,$mb5,${x(mb1, mb5)},$rc1,$rc5,${x(rc1.toDouble, rc5.toDouble)}")
    }
    spark.stop()
  }
}
