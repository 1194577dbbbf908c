package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Operating-point sweep for [[Similarity.mutualNnPairsAnn]]: counts
  * pair-set mismatches (missing ∪ spurious (id_a, id_b, sim_ppm) rows)
  * of the ANN-candidate mutual top-1 vs the brute
  * [[Similarity.mutualNnPairs]] across (nCentroids, nprobe, nbits,
  * bands) at every SF — the [[KnnProbe]] discipline applied to the
  * round-12 swap of the last registered corpus² query. The registered
  * default must be the cheapest point with zero mismatches at all 3
  * SFs. */
object MnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // (nCentroids, nprobe, nbits, bands, multiProbe)
    val grid = Seq(
      (8, 2, 16, 8, true), (8, 2, 32, 8, true),
      (8, 4, 16, 8, true), (8, 4, 32, 8, true),
      (8, 6, 16, 8, true),
      (8, 7, 16, 8, false), (8, 6, 16, 8, false))
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val brute = Similarity.mutualNnPairs(emb, "vec_id", "embedding")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      for ((nc, np, nb, bd, mp) <- grid) {
        val ann = Similarity.mutualNnPairsAnn(emb, "vec_id", "embedding",
            nCentroids = nc, nprobe = np, nbits = nb, bands = bd, multiProbe = mp)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
        val missing = (brute diff ann).size
        val spurious = (ann diff brute).size
        println(s"PROBE $sf nc=$nc np=$np nbits=$nb bands=$bd mp=$mp " +
          s"brute=${brute.size} ann=${ann.size} missing=$missing spurious=$spurious")
      }
    }
    spark.stop()
  }
}
