package graft

import org.apache.spark.sql.SparkSession

/** Measures the ADVICE-r12 rate-index staleness guard's steady-state
  * cost: second ensureRateIndexStore call on a completed store must be
  * one bounded count job (~0.5 s at sf0.1), never a rebuild. Run after
  * touching the store keying or the guard. */
object RateProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.1"
    val total = graft.sources.Tables.events(spark, dir).count()
    val batches = 8
    val rowsPerBatch = (total + batches - 1) / batches
    val (p, n) = graft.streaming.Replay.ensureRateIndexStore(spark, dir, rowsPerBatch, total)
    println(s"PROBE total=$total rowsPerBatch=$rowsPerBatch storeCount=$n path=$p")
    val t0 = System.nanoTime()
    val (p2, n2) = graft.streaming.Replay.ensureRateIndexStore(spark, dir, rowsPerBatch, total)
    println(s"PROBE second-call n=$n2 took=${(System.nanoTime()-t0)/1e9}s (should be a cheap count, no rebuild)")
    spark.stop()
  }
}
