package graft

// Plan-audit / profiling harness (tooling, not part of the library surface).
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import graft.store.SnapshotStore
    import graft.streaming.Replay
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val store = SnapshotStore.ensureEventsStore(spark, dir)
    t("replay 1 batch")(Replay.windowedReplay(spark, store, "s1", filesPerBatch = 100000).count())
    t("replay 3 batches")(Replay.windowedReplay(spark, store, "s3", filesPerBatch = 256).count())
    t("replay 12 batches")(Replay.windowedReplay(spark, store, "s12", filesPerBatch = 64).count())
    spark.stop()
  }
}
