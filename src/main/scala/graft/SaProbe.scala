package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-round shuffle attribution for the suffix-array probe (tooling,
  * like ScaleProbe — not library surface). VERDICT r7 Next #1: the
  * q_suffix_array ScaleProbe rows read 13.9× (flat replica) / 11.0×
  * (unique-text replica) shuffle on 5× input while every unflagged probe
  * reads ~5-7×, and the doubling-round bound doesn't explain it. This
  * harness replays the exact ScaleProbe protocol (warm-up pass, drain,
  * measured pass) but snapshots the shuffle counter at every
  * [[graft.operators.SuffixArray.RoundProbe]] barrier, so the residual
  * decomposes into named phases: token staging, bigram-vocab rank,
  * per-round refinement stages, per-round tiedOf counts, and the final
  * join+orderBy output assembly.
  *
  * Usage: runMain graft.SaProbe [base|flat|uniq ...] — no args = all
  * three datasets.
  */
object SaProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val base = "/root/testdata/sf0.1"
    val flat = "/root/repo/target/scaleprobe/sf0.5"
    val uniq = "/root/repo/target/scaleprobe/sf0.5u"
    ScaleProbe.buildReplica(spark, base, flat, copies = 5)
    ScaleProbe.buildUniqueReplica(spark, base, uniq, copies = 5)

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
    def snap(): Long = {
      org.apache.spark.graftbus.drain(spark.sparkContext)
      shuffleBytes.get()
    }
    def mb(b: Long): Double = (b / 1e5).round / 10.0

    def runOne(tag: String, dir: String): Unit = {
      def query(p: operators.SuffixArray.RoundProbe) =
        operators.SuffixArray
          .suffixRanks(sources.Tables.documents(spark, dir), "doc_id", "text", probe = p)
          .orderBy("gpos")
      // warm-up: builds any missing content-keyed stages, exactly the
      // ScaleProbe protocol — the measured pass then times index reads
      query(operators.SuffixArray.noProbe)
        .write.format("noop").mode("overwrite").save()
      var last = snap()
      val t0 = System.nanoTime()
      query { (phase, tied) =>
        val now = snap()
        println(f"$tag%-6s $phase%-22s shuffle_mb=${mb(now - last)}%8.1f tied=$tied%d")
        last = now
      }.write.format("noop").mode("overwrite").save()
      val now = snap()
      val secs = ((System.nanoTime() - t0) / 1e7).round / 100.0
      println(f"$tag%-6s output_assembly        shuffle_mb=${mb(now - last)}%8.1f tied=-1")
      println(f"$tag%-6s TOTAL wall=${secs}s")
    }

    // "nobcast" arg pins auto-broadcast off (the ScaleProbe ProbeConf pin
    // for q_suffix_array) so both scales measure the sort-merge regime
    val rest = args.toSeq.filterNot(_ == "nobcast")
    if (args.contains("nobcast"))
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val wanted = if (rest.isEmpty) Seq("base", "flat", "uniq") else rest
    wanted.foreach {
      case "base" => runOne("base", base)
      case "flat" => runOne("flat", flat)
      case "uniq" => runOne("uniq", uniq)
      case other  => sys.error(s"unknown dataset '$other' (base|flat|uniq)")
    }
    spark.stop()
  }
}
