package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic hash-based sampling and dataset splitting — the
  * training-pipeline technique for train/val/test assignment at scale:
  * a row's split is a pure function of its id's md5, so the assignment
  * is stable across runs, engines, cluster sizes and data order, needs
  * no RNG state, and costs one codegen'd hash per row (no shuffle, no
  * sample() nondeterminism). md5 of the id's DECIMAL STRING rendering
  * keeps the hash reproducible in any SQL engine.
  */
object Sampling {

  /** First hex nibble of md5(id-as-string) as an int in [0, 16). */
  def hashNibble(idCol: Column): Column =
    conv(substring(md5(idCol.cast("string").cast("binary")), 1, 1), 16, 10).cast("int")

  /** Split assignment by nibble band: [0, trainUpTo) → train,
    * [trainUpTo, valUpTo) → val, [valUpTo, 16) → test. The default-ish
    * 12/2/2 split is trainUpTo=12, valUpTo=14. */
  def hashSplit(idCol: Column, trainUpTo: Int, valUpTo: Int): Column = {
    require(0 < trainUpTo && trainUpTo < valUpTo && valUpTo <= 16,
      s"need 0 < trainUpTo ($trainUpTo) < valUpTo ($valUpTo) <= 16")
    val nib = hashNibble(idCol)
    when(nib < trainUpTo, "train").when(nib < valUpTo, "val").otherwise("test")
  }

  /** Deterministic ~nOf16/16 sample predicate (e.g. 1 → ~6.25%). */
  def hashSample(idCol: Column, nOf16: Int): Column = hashNibble(idCol) < nOf16

  /** Per-stratum deterministic sampling — the domain/language REBALANCING
    * step of a training pipeline (downsample over-represented strata,
    * keep rare ones whole): a row is kept iff its hash nibble falls below
    * its stratum's rate (in 16ths). Same md5 nibble as [[hashSample]], so
    * per-stratum subsets are NESTED (raising a rate only ever ADDS rows —
    * a rebalance never reshuffles what an earlier run kept) and the
    * assignment reproduces in any engine. Strata not in `rates` fall back
    * to `defaultOf16`. */
  def stratifiedSampleFlag(
      idCol: Column,
      stratumCol: Column,
      rates: Seq[(String, Int)],
      defaultOf16: Int): Column = {
    require((defaultOf16 +: rates.map(_._2)).forall(r => r >= 0 && r <= 16),
      s"rates must be in [0, 16]: $rates default=$defaultOf16")
    val nib = hashNibble(idCol)
    rates.foldRight(nib < defaultOf16: Column) { case ((stratum, r), acc) =>
      when(stratumCol === stratum, nib < r).otherwise(acc)
    }
  }

  /** Weighted sampling without replacement, RNG-free: SYSTEMATIC
    * selection by cumulative weight (Madow 1949 — the exact-integer
    * counterpart of the A-ES weighted reservoir, whose u^(1/w) keys
    * would tie the result to libm). Rows take the deterministic
    * pseudo-random total order (md5(id), id); row i with weight w at
    * cumulative offset lo is selected iff [lo, lo+w) contains a multiple
    * of `step` — inclusion probability min(w/step, 1), and the selected
    * set is reproducible in any engine because everything is integer
    * floor-division.
    *
    * The global weighted prefix sum never runs through one partition:
    * rows hash into 16 nibble bands, per-band weight SUMS (16 longs —
    * AQE-stats-shaped, not a data collect) come back as cumulative
    * offsets, and the within-band prefix is a per-band window — the
    * [[graft.operators.Chunking.globalShuffleOrder]] pattern with sums
    * in place of counts. Output: (idCol, weight, cum_before), selected
    * rows only. */
  def weightedSystematicSample(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      weightCol: Column,
      step: Long): org.apache.spark.sql.DataFrame = {
    require(step > 0, s"step must be positive: $step")
    val keyed = df.select(col(idCol), weightCol.cast("long").as("_w"),
      md5(col(idCol).cast("string").cast("binary")).as("_k"),
      hashNibble(col(idCol)).as("_band"))
    val sums = keyed.groupBy(col("_band")).agg(sum(col("_w")).as("_s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until 16).scanLeft(0L)((acc, b) => acc + sums.getOrElse(b, 0L))
    val offsetExpr = (0 until 16).foldLeft(lit(0L)) { (acc, b) =>
      when(col("_band") === b, lit(offsets(b))).otherwise(acc)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_band")).orderBy(col("_k"), col(idCol))
    // multiples of step in [0, x) = ⌈x/step⌉, as pure integer division
    // (Catalyst IntegralDivide) — no magnitude caveat
    def mults(x: Column): Column = call_function("div", x + (step - 1L), lit(step))
    keyed
      .withColumn("_cum", sum(col("_w")).over(w))
      .select(col(idCol), col("_w").as("weight"),
        (offsetExpr + col("_cum") - col("_w")).as("cum_before"))
      .filter(mults(col("cum_before") + col("weight")) > mults(col("cum_before")))
  }

  /** Per-group TOKEN-BUDGET corpus draw — the mixture knob a training
    * run actually turns (q_mix_sample's quota counts DOCUMENTS; a
    * token-budgeted mixture weighs the corpus in the unit the model
    * consumes): per group, take documents in deterministic md5-hash
    * order while the cumulative token weight stays within
    * budget = total·num/den.
    *
    * Scale shape — the selection is the grouped 2-pass pattern
    * (histogram → driver prefix walk → boundary-bucket-only fine pass),
    * NOT a per-group cumulative window over all docs: md5 order is
    * refined by its first byte, so a (group, bucket≤256) weight
    * histogram finds each group's BOUNDARY bucket and the in-bucket
    * remainder on the driver (≤ 256·groups rows, enforced), whole
    * buckets below the boundary are kept by a codegen'd filter, and the
    * per-group ordered cumsum runs over the boundary bucket's ~1/256
    * slice only. A doc is kept iff its global-hash-order cumulative
    * weight ≤ budget — bucket order IS hash-prefix order, so the two
    * formulations are provably identical (spec'd against the naive
    * window). Output per group: (g, n_docs, total_w, budget_w,
    * n_selected, w_selected, sel_id_sum, sel_id_min, sel_id_max). */
  def tokenBudgetSample(
      df: org.apache.spark.sql.DataFrame,
      groupCol: Column,
      idCol: String,
      weightCol: Column,
      budgetNum: Long = 1L,
      budgetDen: Long = 2L,
      maxGroups: Int = 4096): org.apache.spark.sql.DataFrame = {
    require(budgetNum >= 0 && budgetDen > 0, s"bad budget $budgetNum/$budgetDen")
    val d = df.select(groupCol.cast("string").as("g"), col(idCol),
        weightCol.cast("long").as("_w"),
        md5(col(idCol).cast("string").cast("binary")).as("_h"))
      .withColumn("_bucket",
        expr("CAST(conv(substring(_h, 1, 2), 16, 10) AS INT)"))
    val hist = d.groupBy(col("g"), col("_bucket")).agg(sum(col("_w")).as("_s"))
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2)))
    require(hist.length <= maxGroups * 256,
      s"tokenBudgetSample: histogram ${hist.length} rows exceeds " +
        s"${maxGroups * 256} — raise maxGroups deliberately or pre-aggregate")
    // driver prefix walk per group: boundary bucket + in-bucket remainder
    val decisions = hist.groupBy(_._1).map { case (g, rows) =>
      val byBucket = rows.sortBy(_._2)
      val total = byBucket.map(_._3).sum
      val budget = Math.floorDiv(total * budgetNum, budgetDen)
      var cum = 0L
      var bstar = 256 // sentinel: everything fits
      var rem = 0L
      byBucket.iterator.takeWhile(_ => bstar == 256).foreach { case (_, b, s) =>
        if (cum + s > budget) { bstar = b; rem = budget - cum }
        else cum += s
      }
      (g, bstar, rem, total, budget)
    }.toSeq
    val spark = df.sparkSession
    import spark.implicits._
    val dec = broadcast(
      decisions.toDF("g", "_bstar", "_rem", "total_w", "budget_w"))
    val keyed = d.join(dec, Seq("g"))
    val below = keyed.filter(col("_bucket") < col("_bstar"))
    val wBound = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("_h"), col(idCol))
    val boundary = keyed.filter(col("_bucket") === col("_bstar"))
      .withColumn("_cum", sum(col("_w")).over(wBound))
      .filter(col("_cum") <= col("_rem"))
      .drop("_cum")
    val sel = below.unionByName(boundary)
      .groupBy(col("g"))
      .agg(count(lit(1)).as("n_selected"), sum(col("_w")).as("w_selected"),
        sum(col(idCol)).as("sel_id_sum"), min(col(idCol)).as("sel_id_min"),
        max(col(idCol)).as("sel_id_max"))
    val totals = d.groupBy(col("g")).agg(count(lit(1)).as("n_docs"))
    totals.join(dec.select(col("g"), col("total_w"), col("budget_w")), Seq("g"))
      .join(sel, Seq("g"), "left")
      .select(col("g"), col("n_docs"), col("total_w"), col("budget_w"),
        coalesce(col("n_selected"), lit(0L)).as("n_selected"),
        coalesce(col("w_selected"), lit(0L)).as("w_selected"),
        coalesce(col("sel_id_sum"), lit(0L)).as("sel_id_sum"),
        coalesce(col("sel_id_min"), lit(-1L)).as("sel_id_min"),
        coalesce(col("sel_id_max"), lit(-1L)).as("sel_id_max"))
  }

  /** DSIR-style targeted data selection (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling"): rank raw-pool docs
    * by how much their HASHED-BIGRAM profile resembles a small trusted
    * TARGET slice — the "select web text that looks like Wikipedia" move.
    *
    * Fixed-point, RNG-free variant: the paper's per-bucket log-likelihood
    * ratio and Gumbel-noise draw are replaced by (a) a Laplace-smoothed
    * LINEAR likelihood ratio per bucket,
    *   ratio_ppm[b] = ⌊10⁶ · ((t_b+1)/(T+B)) / ((r_b+1)/(R+B))⌋
    * exact in one DECIMAL(38,0) floor-division (no libm, engine-exact),
    * and (b) a deterministic top-k by the per-gram mean ratio
    * (score DIV n_grams) with doc_id tie-break — the same determinism
    * substitutions the rest of this module makes (hash order for RNG).
    *
    * Scale shape: text leaves the scan only as (doc_id, bucket) pairs —
    * grams hash row-local to one of `buckets` ids, the (doc, bucket)
    * count aggregation is map-side combinable, the bucket model is a
    * `buckets`-row broadcast, and the final top-k is TakeOrderedAndProject
    * (never a global sort). Docs with < 2 tokens have no bigrams and
    * drop out of the pool, matching the oracle's comprehension range. */
  def dsirSelect(
      docs: org.apache.spark.sql.DataFrame,
      textCol: String,
      idCol: String,
      isTarget: Column,
      buckets: Int = 256,
      topK: Int = 50): org.apache.spark.sql.DataFrame = {
    val grams = docs
      .select(col(idCol).as("doc_id"), isTarget.as("_tgt"),
        split(col(textCol), " ").as("_t"))
      .filter(size(col("_t")) >= 2)
      .select(col("doc_id"), col("_tgt"), explode(expr(
        """zip_with(slice(_t, 1, size(_t) - 1), slice(_t, 2, size(_t) - 1),
          |         (a, b) -> concat(a, ' ', b))""".stripMargin)).as("_g"))
      .withColumn("_b", expr(
        s"pmod(CAST(conv(substring(md5(CAST(_g AS BINARY)), 1, 12), 16, 10) AS BIGINT), $buckets)"))
    val docBuckets = grams.groupBy(col("doc_id"), col("_tgt"), col("_b"))
      .agg(count(lit(1)).as("_c"))
    val bucketTotals = docBuckets.groupBy(col("_b")).agg(
      sum(when(col("_tgt"), col("_c")).otherwise(0L)).as("_tc"),
      sum(when(!col("_tgt"), col("_c")).otherwise(0L)).as("_rc"))
    val grand = bucketTotals.agg(
      sum(col("_tc")).as("_tt"), sum(col("_rc")).as("_rt"))
    val ratios = bucketTotals.crossJoin(broadcast(grand))
      .withColumn("ratio_ppm", expr(
        s"""CAST((CAST(_tc + 1 AS DECIMAL(38,0)) * (_rt + $buckets) * 1000000) DIV
           |     (CAST(_rc + 1 AS DECIMAL(38,0)) * (_tt + $buckets)) AS BIGINT)""".stripMargin))
      .select(col("_b"), col("ratio_ppm"))
    docBuckets.filter(!col("_tgt"))
      .join(broadcast(ratios), Seq("_b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_c")).as("n_grams"),
        sum(col("_c").cast("decimal(38,0)") * col("ratio_ppm")).as("_score"))
      .select(col("doc_id"), col("n_grams"),
        expr("CAST(_score DIV n_grams AS BIGINT)").as("dsir_ppm"))
      .orderBy(col("dsir_ppm").desc, col("doc_id"))
      .limit(topK)
  }
}
