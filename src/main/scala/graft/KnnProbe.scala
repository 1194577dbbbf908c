package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.sources.Tables

/** Operating-point sweep for [[Similarity.knnClassifyAnn]]: counts
  * (predicted, n_votes) mismatches of the ANN-candidate classifier vs
  * the brute [[Similarity.knnClassify]] across (nCentroids, nprobe,
  * nbits, bands) at every SF. The round-10 run of this probe (table in
  * BUILDER_NOTES) showed the benchmark embeddings are near-random —
  * every sparser point than (8, 6, 16, 8) left 1-90 mismatches — which
  * is why q_knn_classify's default operating point is dense. */
object KnnProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val grid = Seq(
      (8, 4, 16, 4), (8, 5, 16, 4), (8, 6, 16, 4),
      (8, 4, 16, 8), (8, 6, 16, 8),
      (16, 6, 16, 4), (16, 8, 16, 4), (32, 12, 16, 4),
      (8, 6, 32, 8), (16, 8, 32, 8))
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val dir = s"/root/testdata/$sf"
      val emb = Tables.embeddings(spark, dir)
      val evalF = pmod(col("vec_id"), lit(10L)) === 3L
      val bruteMap = Similarity.knnClassify(emb, "vec_id", "embedding", "label", evalF, 5)
        .select("q_id", "predicted", "n_votes")
        .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
      for ((nc, np, nb, bd) <- grid) {
        val ann = Similarity.knnClassifyAnn(emb, "vec_id", "embedding", "label", evalF, 5,
            nCentroids = nc, nprobe = np, nbits = nb, bands = bd)
          .select("q_id", "predicted", "n_votes")
          .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2))))
        val mism = ann.count { case (q, pv) => !bruteMap.get(q).contains(pv) }
        println(s"PROBE $sf nc=$nc np=$np nbits=$nb bands=$bd n=${ann.length} mismatches=$mism")
      }
    }
    spark.stop()
  }
}
