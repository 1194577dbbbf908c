package graft.operators

import org.apache.spark.sql.DataFrame
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
}
