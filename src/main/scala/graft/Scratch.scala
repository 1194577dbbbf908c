package graft

// Plan-audit / profiling harness (tooling, not part of the library surface).
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    Seq("q_range_scan", "q_pairing_roundtrip").foreach { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      println(s"\n========== $name ==========")
      println(df.queryExecution.executedPlan.toString.take(3000))
    }
    spark.stop()
  }
}
