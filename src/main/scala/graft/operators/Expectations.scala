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

  /** Referential-integrity audit of one FK relationship (the dbt-style
    * "relationship test", generalized to report BOTH directions): child
    * rows whose FK has no parent (orphans — a broken join waiting to
    * happen) AND parent keys no child ever references (unreferenced —
    * dead dimension rows, or a load that silently dropped facts).
    *
    * Scale shape: orphans = one left-anti join child⋈parent-keys
    * (broadcast when the parent is a dim, shuffle otherwise — the
    * planner's call) feeding a count-only aggregate, so no child
    * payload survives the join; unreferenced = anti join of parent keys
    * against the child's DISTINCT FK values (one key-column-only
    * aggregation). Both sides move key columns exclusively. NULL FKs
    * are counted separately, not as orphans (a nullable FK is a
    * modeling choice; a dangling one is corruption).
    *
    * Output: one row — (rel, n_child, n_null_fk, n_orphans, orphan_ppm,
    * n_parents, n_unreferenced). Union rows across relationships for
    * the schema-wide verdict table. */
  def fkAudit(
      rel: String,
      child: DataFrame,
      fk: Column,
      parent: DataFrame,
      pk: Column): DataFrame = {
    val ck = child.select(fk.as("_fk"))
    val pkeys = parent.select(pk.as("_pk"))
    val orphans = ck.filter(col("_fk").isNotNull)
      .join(pkeys, col("_fk") === col("_pk"), "left_anti")
      .agg(count(lit(1)).as("n_orphans"))
    val totals = ck.agg(count(lit(1)).as("n_child"),
      sum(when(col("_fk").isNull, 1L).otherwise(0L)).as("n_null_fk"))
    val unref = pkeys
      .join(ck.filter(col("_fk").isNotNull).distinct(),
        col("_pk") === col("_fk"), "left_anti")
      .agg(count(lit(1)).as("n_unreferenced"))
    val np = pkeys.agg(count(lit(1)).as("n_parents"))
    totals.crossJoin(orphans).crossJoin(np).crossJoin(unref)
      .select(lit(rel).as("rel"), col("n_child"), col("n_null_fk"),
        col("n_orphans"),
        when(col("n_child") > 0,
          expr("n_orphans * 1000000 DIV n_child")).otherwise(0L).as("orphan_ppm"),
        col("n_parents"), col("n_unreferenced"))
  }
}
