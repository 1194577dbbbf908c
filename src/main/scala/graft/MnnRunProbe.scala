package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Stage-level cost attribution for the registered q_mutual_nn DENSE
  * run (r15 optimization round): times the candidate generation and the
  * verify tail separately, and counts the candidate stream, so the
  * 17-64 s draw variance of the dense operating point decomposes into
  * "candidate volume" vs "verify/argmax" vs JVM noise. Run at 32 cores
  * like the bench; prints one line per stage. */
object MnnRunProbe {
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
      println(f"MNNRUN $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()

    val emb = Tables.embeddings(spark, dir)
    for (pass <- 1 to 2) {
      // full registered path (ledger + tuned decision + run)
      time(s"pass$pass mutualNnTuned")(noop(
        Similarity.mutualNnTuned(emb, "vec_id", "embedding",
          fallbackCentroids = 8, fallbackNprobe = 2).orderBy("id_a")))
      // dense run alone (what a ledger hit replays)
      time(s"pass$pass densePairsAnn")(noop(
        Similarity.mutualNnPairsAnn(emb, "vec_id", "embedding",
          nCentroids = 8, nprobe = 2, nbits = 16, bands = 8,
          multiProbe = true).orderBy("id_a")))
      // candidate stream volume (IVF + multiprobe LSH, pre-verify)
      val n = time(s"pass$pass candCount")(
        Similarity.annMutualCandidates(emb, "vec_id", "embedding",
          nCentroids = 8, nprobe = 2, nbits = 16, bands = 8,
          maxBucket = 100000, multiProbe = true, centroids = None).count())
      println(s"MNNRUN pass$pass candidates: $n")
    }
    spark.stop()
  }
}
