package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** VERDICT r8 Next #3: attribute the store_write 2.1× r7→r8 residual.
  *
  * BENCH_r08 recorded store_write 13.68 s vs r7's 6.42 s with calib_fs
  * 1.34× slower — environment explains part; this probe decomposes the
  * rest by running the exact Bench store builds REPEATEDLY with the
  * calibration probes interleaved in one JVM, and by counting what the
  * build actually writes (dirs / files / bytes — a layout regression
  * would show here; the write path itself hasn't changed since r7).
  *
  * Emits one line per iteration:
  *   iter=N calib_cpu=… calib_fs=… store_write=… geojson_write=…
  *   dirs=… files=… mb=…  ratio_sw_fs=…
  * plus a MIN summary — the per-metric min over iterations bounds the
  * FS-variance band exactly like Bench's two-pass min.
  */
object StoreWriteProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val iters = sys.env.getOrElse("SPARK_GRAFT_PROBE_ITERS", "3").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.hadoop.mapreduce.fileoutputcommitter.algorithm.version", "2")
      .config("spark.hadoop.fs.file.impl",
        sys.env.getOrElse("GRAFT_FILE_FS", "org.apache.hadoop.fs.LocalFileSystem"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.store.SnapshotStore

    def time(fn: => Unit): Double = {
      val t0 = System.nanoTime(); fn; (System.nanoTime() - t0) / 1e9
    }
    def materialize(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    materialize(spark.range(1000).toDF("i"))

    val calibPath = "target/graft_calib/scan_probe"
    if (!new java.io.File(calibPath, "_SUCCESS").isFile)
      spark.range(32L * 1000 * 1000)
        .select(col("id"), xxhash64(col("id")).as("h"), pmod(col("id"), lit(997)).as("k"))
        .write.mode("overwrite").parquet(calibPath)
    def calibFs(): Double = time(materialize(
      spark.read.parquet(calibPath).select(sum(col("id")),
        sum(col("h").bitwiseAND(lit(0x7FFFFFFFL))), sum(col("k")))))
    def calibCpu(): Double = time(materialize(
      spark.range(256L * 1000 * 1000)
        .select(sum(xxhash64(col("id")).bitwiseAND(lit(0x7FFFFFFFL))))))

    def census(root: java.io.File): (Long, Long, Long) = {
      var dirs = 0L; var files = 0L; var bytes = 0L
      def walk(f: java.io.File): Unit =
        if (f.isDirectory) { dirs += 1; f.listFiles().foreach(walk) }
        else { files += 1; bytes += f.length() }
      if (root.exists()) walk(root)
      (dirs, files, bytes)
    }

    val mins = scala.collection.mutable.Map[String, Double]().withDefaultValue(Double.MaxValue)
    (1 to iters).foreach { i =>
      val cc = calibCpu()
      val cf = math.min(calibFs(), calibFs())
      SnapshotStore.deleteRecursively(new java.io.File(SnapshotStore.root))
      val sw = time(SnapshotStore.ensureEventsStore(spark, sfDir))
      val (d1, f1, b1) = census(new java.io.File(SnapshotStore.root))
      val gw = time(graft.queries.CoreQueries.ensureCanonicalGeoStore(spark, sfDir))
      val (d2, f2, b2) = census(new java.io.File(SnapshotStore.root))
      Seq("calib_cpu" -> cc, "calib_fs" -> cf, "store_write" -> sw,
        "geojson_write" -> gw).foreach { case (k, v) =>
        mins(k) = math.min(mins(k), v)
      }
      println(f"iter=$i calib_cpu=$cc%.3f calib_fs=$cf%.3f store_write=$sw%.2f " +
        f"geojson_write=$gw%.2f events_dirs=$d1 events_files=$f1 events_mb=${b1 / 1e6}%.1f " +
        f"total_dirs=$d2 total_files=$f2 total_mb=${b2 / 1e6}%.1f ratio_sw_fs=${sw / cf}%.2f")
    }
    println(f"MIN calib_cpu=${mins("calib_cpu")}%.3f calib_fs=${mins("calib_fs")}%.3f " +
      f"store_write=${mins("store_write")}%.2f geojson_write=${mins("geojson_write")}%.2f " +
      f"ratio_sw_fs=${mins("store_write") / mins("calib_fs")}%.2f")
    spark.stop()
  }
}
