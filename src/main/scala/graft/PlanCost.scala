package graft

// One-shot pricing harness (tooling): literal-centroid vs broadcast-join
// nearest-centroid assignment as k grows — evidence for the k-regime
// guidance on Clustering.assignQuantized / assignQuantizedBroadcast
// (results tabled in BUILDER_NOTES.md).
object PlanCost {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val D = 64
    val pts = (1L to 2000L).map(i => (i, (0 until D).map(d => (i * 31 + d) % 997L)))
      .toDF("id", "_qv").cache()
    pts.count()
    def cents(k: Int) =
      (0 until k).map(j => (0 until D).map(d => (j * 17 + d) % 997L).toArray).toArray
    def time(tag: String, k: Int)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      try {
        val n = f
        println(s"$tag k=$k ok rows=$n wall_ms=${(System.nanoTime() - t0) / 1000000}")
      } catch {
        case e: Throwable =>
          println(s"$tag k=$k FAIL after ${(System.nanoTime() - t0) / 1000000} ms: " +
            s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(160)}")
      }
    }
    for (k <- Seq(256, 1024, 2048, 4096, 8192))
      time("LIT", k) {
        graft.operators.Clustering.assignQuantized(pts, "id", cents(k)).count()
      }
    for (k <- Seq(256, 1024, 4096, 16384))
      time("BC", k) {
        graft.operators.Clustering.assignQuantizedBroadcast(pts, "id", cents(k)).count()
      }
    spark.stop()
  }
}
