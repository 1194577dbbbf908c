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
    // round 1: per-item majority, ties to smallest label. The per-(item,
    // label) census is staged: majority, the final revote tie-frame and
    // the per-item vote counts all derive from it, and unstaged each
    // consumer re-ran the full vote-log scan + aggregation
    val c1 = graft.store.Staging.stage(
      v.groupBy(col("_item"), col("_label")).agg(count(lit(1)).as("_n")),
      "vote_counts")
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
    // per-item vote count from the staged census (Σ _n ≡ count(*)),
    // instead of a fourth full scan of the vote log
    val nAnnot = c1.groupBy(col("_item")).agg(sum(col("_n")).as("n_annot"))
    nAnnot.join(maj, Seq("_item")).join(fin, Seq("_item"))
      .select(col("_item").as(itemCol), col("n_annot"),
        col("maj_label"), col("final_label"),
        (col("maj_label") =!= col("final_label")).cast("long").as("changed"))
  }

  /** Pairwise Cohen's kappa — chance-corrected inter-annotator agreement
    * for every annotator pair that shares ≥ `minShared` items. THE
    * labeling-quality gate before [[goldenLabels]] aggregation: raw
    * agreement rewards annotators who always pick the majority class;
    * kappa subtracts the agreement their label MARGINALS would produce
    * by chance (κ = (p_o − p_e)/(1 − p_e)).
    *
    * Exact integer: with n shared items, agreement count a, and
    * per-label marginals c_p(l), c_q(l) over the SHARED set,
    * p_e·n² = Σ_l c_p(l)·c_q(l), so
    * κ_ppm = floor(10⁶·(a·n − Σ c_p c_q) / (n² − Σ c_p c_q)) — one
    * floor-division at the end, truncation toward −∞ on both engines
    * (DuckDB // and Spark DIV agree on negatives... they do NOT: Spark
    * DIV truncates toward zero. κ is cleared through sign-split: the
    * numerator's sign is extracted and the division runs on |num|).
    * Degenerate n² = Σ c_p c_q (both annotators constant and equal —
    * p_e = 1) reports κ = 0 with agree_ppm carrying the signal.
    *
    * Scale shape: one (item, annot) dedup agg, a per-item annotator
    * pair join (C(annotators-per-item, 2) rows per item — the wedge
    * cost class, bounded by the per-item annotation fan), then two
    * map-side-combined aggs: per (p, q, label-pair-role) marginal
    * counts and the final per-(p, q) rollup. Annotator-pair count, not
    * item count, bounds the output.
    *
    * Output: (annot_a, annot_b, n_shared, agree_ppm, kappa_ppm),
    * annot_a < annot_b. */
  def pairwiseKappa(
      votes: DataFrame,
      itemCol: String,
      annotCol: String,
      labelCol: String,
      minShared: Long = 1L): DataFrame = {
    require(minShared >= 1, s"minShared must be >= 1: $minShared")
    // one deterministic label per (item, annotator): min label
    val v = votes.groupBy(col(itemCol).as("_item"), col(annotCol).as("_an"))
      .agg(min(col(labelCol)).as("_l"))
    val pairRows = v.as("x").join(v.as("y"),
        col("x._item") === col("y._item") && col("x._an") < col("y._an"))
      .select(col("x._an").as("annot_a"), col("y._an").as("annot_b"),
        col("x._l").as("_la"), col("y._l").as("_lb"))
    // per-(pair, label): marginal counts of each side over shared items
    val marg = pairRows
      .select(col("annot_a"), col("annot_b"), explode(array(
        struct(col("_la").as("_l"), lit(1L).as("_ca"), lit(0L).as("_cb")),
        struct(col("_lb").as("_l"), lit(0L).as("_ca"), lit(1L).as("_cb")))).as("_m"))
      .groupBy(col("annot_a"), col("annot_b"), col("_m._l"))
      .agg(sum(col("_m._ca")).as("_cp"), sum(col("_m._cb")).as("_cq"))
      .groupBy(col("annot_a"), col("annot_b"))
      .agg(sum(expr("CAST(_cp AS DECIMAL(38,0)) * _cq")).as("_pe"))
    val agg = pairRows.groupBy(col("annot_a"), col("annot_b"))
      .agg(count(lit(1)).as("n_shared"),
        sum((col("_la") === col("_lb")).cast("long")).as("_a"))
    agg.join(marg, Seq("annot_a", "annot_b"))
      .filter(col("n_shared") >= minShared)
      .withColumn("agree_ppm", expr("_a * 1000000 DIV n_shared"))
      .withColumn("_num",
        expr("CAST(_a AS DECIMAL(38,0)) * n_shared - _pe"))
      .withColumn("_den",
        expr("CAST(n_shared AS DECIMAL(38,0)) * n_shared - _pe"))
      .withColumn("kappa_ppm",
        when(col("_den") === 0, lit(0L)).otherwise(
          signum(col("_num")).cast("long") *
            expr("CAST(abs(_num) * 1000000 DIV _den AS BIGINT)")))
      .select(col("annot_a"), col("annot_b"), col("n_shared"),
        col("agree_ppm"), col("kappa_ppm"))
  }

  /** Leave-one-out m-estimate target encoding — the standard
    * high-cardinality categorical feature for tabular training data,
    * with the two classic leaks engineered out: LEAVE-ONE-OUT (each
    * row's own target is subtracted from its category total, so the
    * feature never memorizes the row it describes) and m-estimate
    * SMOOTHING toward the global mean (rare categories shrink to the
    * prior instead of parroting their 2-3 targets):
    *
    *   enc_i = (Σ_cat y − y_i + m·ȳ_global) / (n_cat − 1 + m)
    *
    * cleared over the global count so the milli rendering is ONE
    * DECIMAL(38,0) floor-division per row — exact in any engine.
    *
    * Scale shape: one map-side-combined category rollup + a 1-row
    * global total; both join back onto the fact rows as broadcasts
    * (category frame = #categories rows), so the fact table is touched
    * in ONE pass and never shuffles. m ≥ 1 keeps the encoding defined
    * even for singleton categories (n−1+m > 0).
    *
    * Input: (idCol, catCol, yCol integer). Output: one row per input
    * row — (id, cat, n_cat, loo_milli). */
  def targetEncodeLoo(
      df: DataFrame,
      idCol: Column,
      catCol: Column,
      yCol: Column,
      m: Int = 10): DataFrame = {
    require(m >= 1, s"smoothing m must be >= 1: $m")
    val b = df.select(idCol.as("id"), catCol.as("cat"), yCol.as("_y"))
    val cat = b.groupBy(col("cat"))
      .agg(sum(col("_y")).as("_csum"), count(lit(1)).as("n_cat"))
    val g = b.agg(sum(col("_y")).as("_gsum"), count(lit(1)).as("_gn"))
    b.join(broadcast(cat), Seq("cat"))
      .crossJoin(broadcast(g))
      .withColumn("loo_milli", expr(
        s"""CAST(((CAST(_csum AS DECIMAL(38,0)) - _y) * _gn + $m * CAST(_gsum AS DECIMAL(38,0)))
           |  * 1000 DIV ((CAST(n_cat AS DECIMAL(38,0)) - 1 + $m) * _gn) AS BIGINT)""".stripMargin))
      .select(col("id"), col("cat"), col("n_cat"), col("loo_milli"))
  }
}
