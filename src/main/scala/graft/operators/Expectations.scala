package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations: declarative constraint rules audited in
  * ONE aggregate pass over the table (the lakehouse "expectations"
  * pattern — validate at ingest, gate the write on the result). Each
  * rule is a violation predicate; the audit emits one row per rule with
  * the violation count, so a pipeline can fail, quarantine, or log per
  * rule without re-scanning.
  *
  * Scale: all predicate rules fold into a single map-side-combined
  * aggregation (one scan, one 1-row shuffle) regardless of rule count;
  * a uniqueness rule needs its own distinct aggregate (one extra
  * shuffle of the key column only).
  */
object Expectations {

  /** Audit `rules` (name → violation predicate) in one pass.
    * Output: (rule, n_checked, n_violations, pass). */
  def audit(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty)
    val aggs = count(lit(1)).as("_n") +:
      rules.map { case (n, viol) => sum(when(viol, 1L).otherwise(0L)).as(s"_v_$n") }
    val stacked = rules.map { case (n, _) => s"'$n', `_v_$n`" }.mkString(", ")
    df.agg(aggs.head, aggs.tail: _*)
      .selectExpr("_n AS n_checked", s"stack(${rules.size}, $stacked) AS (rule, n_violations)")
      .select(col("rule"), col("n_checked"), col("n_violations"),
        (col("n_violations") === 0L).as("pass"))
  }

  /** Key-uniqueness rule: violations = duplicate rows beyond the first
    * per key. Same output shape as [[audit]] so the frames union. */
  def uniqueAudit(df: DataFrame, name: String, key: Column): DataFrame =
    df.agg(count(lit(1)).as("_n"), count_distinct(key).as("_d"))
      .select(lit(name).as("rule"), col("_n").as("n_checked"),
        (col("_n") - col("_d")).as("n_violations"),
        (col("_n") === col("_d")).as("pass"))
}
