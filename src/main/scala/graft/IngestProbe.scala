package graft

import org.apache.spark.sql.SparkSession

/** Stage-attribution probe for the streaming ingest-dedup replay
  * (q_stream_ingest_dedup): runs the replay once with a per-batch wall
  * clock (the foreachBatch body logs its own phases via the listener-free
  * wall timer here), so the 12-13 s workload decomposes into
  * source/store build, per-batch compute, and engine overhead. */
object IngestProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"INGEST $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    val store = time("ensureDocIngestStore") {
      graft.streaming.Replay.ensureDocIngestStore(spark, dir, 5)
    }
    (1 to 2).foreach { i =>
      val df = time(s"run$i ingestDedupReplay") {
        graft.streaming.Replay.ingestDedupReplay(spark, store,
          s"${graft.store.SnapshotStore.root}/ingest_dedup_probe", 800000L)
      }
      time(s"run$i materialize") {
        df.write.format("noop").mode("overwrite").save()
      }
    }
    spark.stop()
  }
}
