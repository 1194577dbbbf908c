package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Operating-point sweep for [[Similarity.hardNegativesAnn]]: counts
  * (neg_id, neg_sim_ppm) mismatches of the ANN-candidate hardest
  * negative vs the brute [[Similarity.hardNegatives]] per anchor at
  * every SF (the [[KnnProbe]]/[[MnnProbe]] discipline). The registered
  * default must be the cheapest point with zero mismatches at all 3
  * SFs. */
object HnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val grid = Seq(
      (8, 2, 64, 8), (8, 2, 32, 8), (8, 2, 16, 4),
      (8, 4, 64, 8), (8, 4, 32, 8), (8, 4, 16, 4),
      (8, 4, 16, 8), (8, 6, 16, 8),
      (16, 4, 32, 8), (16, 8, 16, 4))
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val anchorF = pmod(col("vec_id"), lit(25L)) === 0L
      val brute = Similarity.hardNegatives(emb, "vec_id", "embedding", "label", anchorF)
        .select("a_id", "neg_id", "neg_sim_ppm")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      for ((nc, np, nb, bd) <- grid) {
        val ann = Similarity.hardNegativesAnn(emb, "vec_id", "embedding", "label",
            anchorF, nCentroids = nc, nprobe = np, nbits = nb, bands = bd)
          .select("a_id", "neg_id", "neg_sim_ppm")
          .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        val mism = ann.count { case (a, ns) => !brute.get(a).contains(ns) } +
          (brute.size - ann.length).max(0)
        println(s"PROBE $sf nc=$nc np=$np nbits=$nb bands=$bd " +
          s"anchors=${brute.size} ann=${ann.length} mismatches=$mism")
      }
    }
    spark.stop()
  }
}
