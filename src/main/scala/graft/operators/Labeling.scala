package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Crowd-label aggregation for supervised/preference training data: the
  * step between raw multi-annotator labels and a training set (RLHF
  * preference pairs, SFT quality tags, eval golden sets) — one label per
  * item, weighting annotators by how reliable they are.
  *
  * Two-round Dawid–Skene-lite, all exact integer arithmetic:
  *   round 1 — plain majority per item (tie → lexicographically
  *             smallest label, a deterministic rule both engines share);
  *   round 2 — each annotator's reliability = fraction of their votes
  *             agreeing with round-1 majorities (integer ppm,
  *             floor-division), then a reliability-WEIGHTED revote
  *             (Σ reliability_ppm per (item, label), argmax, same tie
  *             rule). One EM half-step: the standard fixed-point
  *             truncation that keeps the whole computation closed-form
  *             and oracle-replayable (full Dawid–Skene iterates this).
  *
  * Spark shape: two (item, label) map-side-combinable counts, two
  * per-item windows (rank-1 argmax — WindowGroupLimit pushes the rank),
  * one annotator-keyed aggregate joined back to votes. Items and
  * annotators both shard; nothing is per-row sequential; at 100 TB every
  * stage is a keyed shuffle of (item|annotator, label) tuples, never
  * label text payloads.
  */
object Labeling {

  /** Output: (itemCol, n_annot, maj_label, final_label, changed). */
  def goldenLabels(
      votes: DataFrame,
      itemCol: String,
      annotCol: String,
      labelCol: String): DataFrame = {
    val v = votes.select(col(itemCol).as("_item"), col(annotCol).as("_annot"),
      col(labelCol).as("_label"))
    // round 1: per-item majority, ties to smallest label
    val c1 = v.groupBy(col("_item"), col("_label")).agg(count(lit(1)).as("_n"))
    val wMaj = Window.partitionBy(col("_item"))
      .orderBy(col("_n").desc, col("_label"))
    val maj = c1.withColumn("_rn", row_number().over(wMaj))
      .filter(col("_rn") === 1)
      .select(col("_item"), col("_label").as("maj_label"))
    // round 2: annotator reliability in ppm (floor), weighted revote
    val rel = v.join(maj, Seq("_item"))
      .groupBy(col("_annot"))
      .agg(count(lit(1)).as("_nv"),
        sum((col("_label") === col("maj_label")).cast("long")).as("_agree"))
      .select(col("_annot"), expr("_agree * 1000000 DIV _nv").as("_rel_ppm"))
    val c2 = v.join(rel, Seq("_annot"))
      .groupBy(col("_item"), col("_label"))
      .agg(sum(col("_rel_ppm")).as("_w"))
    val wFin = Window.partitionBy(col("_item"))
      .orderBy(col("_w").desc, col("_label"))
    val fin = c2.withColumn("_rn", row_number().over(wFin))
      .filter(col("_rn") === 1)
      .select(col("_item"), col("_label").as("final_label"))
    val nAnnot = v.groupBy(col("_item")).agg(count(lit(1)).as("n_annot"))
    nAnnot.join(maj, Seq("_item")).join(fin, Seq("_item"))
      .select(col("_item").as(itemCol), col("n_annot"),
        col("maj_label"), col("final_label"),
        (col("maj_label") =!= col("final_label")).cast("long").as("changed"))
  }
}
