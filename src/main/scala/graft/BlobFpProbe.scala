package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Attribution probe for the 15 s simhash_fp staging build behind
  * q_dedup_blob / q_dedup_blob64: times each phase of the blob simhash
  * pipeline (blob table, hex+shingle explode, md5 vote agg, xx64 vote
  * agg) in isolation so the slow phase is measured, not guessed. */
object BlobFpProbe {
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
      val t0 = System.nanoTime(); val r = f
      println(f"BLOBFP $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    def mat(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    import graft.operators.Multimodal
    val blobs = Multimodal.toBlobTable(
      graft.sources.Tables.documents(spark, dir), "doc_id", "text", "text")
    time("blob table")(mat(blobs))
    val withHex = blobs.select(col("doc_id"), col("n_bytes"), hex(col("content")).as("_hex"))
    val grams = transform(
      sequence(lit(1L), greatest(col("n_bytes") - 3L, lit(1L))),
      i => col("_hex").substr((i * 2 - 1).cast("int"), lit(8)))
    val sh = when(col("n_bytes") >= 4, grams).otherwise(array().cast("array<string>"))
    time("shingle explode count")(
      println("rows=" + withHex.select(explode(sh).as("_t")).count()))
    time("explode+md5")(mat(withHex.repartition(col("doc_id"))
      .select(col("doc_id"), explode(sh).as("_t"))
      .select(col("doc_id"), md5(col("_t").cast("binary")).as("_h"))))
    (1 to 2).foreach { it =>
      time(s"it$it blobSimhash32 (md5 votes)")(mat(Multimodal.blobSimhash32(blobs, "doc_id")))
      time(s"it$it blobSimhash64 (xx votes)")(mat(Multimodal.blobSimhash64(blobs, "doc_id")))
    }
    spark.stop()
  }
}
