package graft

// Temporary profiling harness (not part of the library surface).
object Scratch {
  def main(args: Array[String]): Unit = {
    import org.apache.spark.sql.SparkSession
    import org.apache.spark.sql.functions._
    import graft.operators.{Dedup, TextAnalysis}
    import graft.sources.Tables
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.1"
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val docs = Tables.documents(spark, dir).withColumn("_toks", split(col("text"), " "))
    t("warmup")(noop(spark.range(100).toDF("i")))
    t("read only")(noop(docs))
    t("repart only")(noop(docs.repartition(col("doc_id"))))
    t("shingles explode")(noop(docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(Dedup.tokenShingles(col("_toks"), 3)).as("_s"))))
    t("  + md5")(noop(docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(Dedup.tokenShingles(col("_toks"), 3)).as("_s"))
      .select(col("doc_id"), md5(col("_s").cast("binary")).as("_h"))))
    t("  + agg min/max/count")(noop(docs.repartition(col("doc_id"))
      .select(col("doc_id"), explode(Dedup.tokenShingles(col("_toks"), 3)).as("_s"))
      .select(col("doc_id"), col("_s"), md5(col("_s").cast("binary")).as("_h"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n"), min("_h").as("a"), max("_h").as("b"))))
    t("  + agg countDistinct")(noop(TextAnalysis.fingerprintFrame(docs, "doc_id",
      Dedup.tokenShingles(col("_toks"), 3))))
    t("minhash sig")(noop(Dedup.minhashSignatures(docs, "doc_id",
      Dedup.tokenShingles(col("_toks"), 3), 64)))
    spark.stop()
  }
}
