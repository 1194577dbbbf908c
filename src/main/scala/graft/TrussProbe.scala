package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway support-distribution probe for picking the truss threshold
  * (tooling). */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args.toSeq) {
      val lp = graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey").as("o"), col("l_partkey").as("p")).distinct()
      val und = lp.as("a")
        .join(lp.as("b"), col("a.o") === col("b.o") && col("a.p") < col("b.p"))
        .select(col("a.p").as("u"), col("b.p").as("v")).distinct()
      val t0 = System.nanoTime()
      val sup = graft.operators.Graph.edgeSupport(und).cache()
      val n = und.count()
      val q = sup.stat.approxQuantile("sup",
        Array(0.5, 0.9, 0.95, 0.99, 0.999), 0.001)
      println(s"$dir edges=$n with_sup=${sup.count()} " +
        s"q50/90/95/99/999=${q.mkString(",")} " +
        f"t=${(System.nanoTime() - t0) / 1e9}%.1f s")
      sup.unpersist()
    }
    spark.stop()
  }
}
