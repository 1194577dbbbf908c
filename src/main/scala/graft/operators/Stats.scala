package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Per-group frame statistics — the reference's per-snapshot bbox
  * materialization (/root/reference/stores/postgresql_velocity_split.py:18-23,
  * 103-106): min/max of each measure per group key, computed in one
  * map-side-combined aggregation (a single shuffle of (group, 2·k doubles),
  * never of the raw rows).
  */
object Stats {

  /** groupBy(keyCol) → min_/max_ per measure + row count. */
  def bbox(df: DataFrame, keyCol: String, measures: Seq[String]): DataFrame = {
    val aggs = measures.flatMap { m =>
      Seq(min(col(m)).as(s"min_$m"), max(col(m)).as(s"max_$m"))
    } :+ count(lit(1)).as("n")
    df.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Exact nearest-rank percentiles per group: the value at sorted row
    * ceil(q·n) — the quality-threshold statistic of a training-data
    * pipeline (p99 document length, p50 quality score). Pure integer
    * selection (no interpolation), so the result is FP-free and
    * reproducible in any SQL engine, unlike `percentile` (interpolated
    * double) or `approx_percentile` (sketch-dependent). `tieCol` makes
    * the row_number total order deterministic; equal values make the
    * SELECTED value identical regardless of tie order anyway.
    *
    * Scale shape: one hash Exchange on the group key feeds both the
    * window rank and the final aggregation (same key ⇒ the partitioning
    * is reused, no second shuffle); the per-group sort is the honest
    * price of EXACT percentiles — the sketch path (approx_percentile)
    * exists when ±ε suffices. Output: key, n_docs, p<q>_<valCol> per q
    * (q in percent). */
  def nearestRankPercentiles(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      tieCol: String,
      percents: Seq[Int]): DataFrame = {
    val rankW = Window.partitionBy(col(keyCol)).orderBy(col(valCol), col(tieCol))
    val countW = Window.partitionBy(col(keyCol))
    val picks = percents.map { p =>
      max(when(col("_r") === ceil(col("_n") * lit(p / 100.0)), col(valCol)))
        .as(s"p${p}_$valCol")
    }
    df.select(col(keyCol), col(valCol), col(tieCol))
      .withColumn("_r", row_number().over(rankW))
      .withColumn("_n", count(lit(1)).over(countW))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"), picks: _*)
  }
}
