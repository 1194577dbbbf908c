package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Per-day peak concurrency of half-open intervals [start, end) — the
    * sweep-line / "max concurrent sessions" statistic. Endpoints become
    * (+1 at start, −1 at end) deltas; the concurrency at an instant is
    * the running sum of all deltas up to it in (ts, delta, tie) order —
    * delta ascending puts the −1 of an interval ending at t BEFORE a +1
    * starting at t, i.e. half-open semantics. Rows with a null start or
    * end are dropped (the operator's input contract is complete
    * intervals).
    *
    * The classic algorithm is one global sort + running sum; the
    * distributed form never funnels 100 TB of endpoints through a single
    * partition: endpoints band by epoch DAY, per-band delta totals come
    * back to the driver (span-bounded — one long per day of data, the
    * same AQE-stats-shaped collect as [[skyline2d]]'s band maxes), their
    * exclusive prefix sums are the carried-in concurrency of each band —
    * broadcast-joined back, never a per-day when() chain whose depth
    * would break codegen on a multi-decade span — and the in-band
    * running sum is a per-band window. Banded prefix + in-band cum ≡ the
    * global running sum because bands partition the time axis. A
    * synthetic delta-0 row at each day's first instant makes the
    * carried-in level itself a candidate, so a day whose maximum holds
    * from midnight (a long-lived session ending mid-day) reports that
    * level with at_us = start of day rather than understating the peak.
    *
    * Output: (day_idx epoch-days, peak, at_us = earliest µs instant of
    * the day achieving the peak), days with ≥1 endpoint only. Equal
    * (ts, delta) rows from different tie values permute only which ROW
    * carries which intermediate sum at that instant, never the per-day
    * max or its earliest instant — the output is tie-order-stable. */
  def peakConcurrency(
      intervals: DataFrame,
      startUs: org.apache.spark.sql.Column,
      endUs: org.apache.spark.sql.Column,
      tieCol: org.apache.spark.sql.Column): DataFrame = {
    val DayUs = 86400000000L
    val iv = intervals.select(startUs.as("_s"), endUs.as("_e"), tieCol.as("_tie"))
      .filter(col("_s").isNotNull && col("_e").isNotNull)
    // pure-integer floor division (exact past 2^53, unlike floor(x / d.0))
    val pts = iv.select(col("_s").as("ts_us"), lit(1L).as("d"), col("_tie"))
      .unionByName(iv.select(col("_e").as("ts_us"), lit(-1L).as("d"), col("_tie")))
      .withColumn("day_idx", call_function("div",
        col("ts_us") - pmod(col("ts_us"), lit(DayUs)), lit(DayUs)))
    val bandSums = pts.groupBy(col("day_idx")).agg(sum(col("d")).as("_s"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // exclusive prefix: concurrency carried into each day from all prior days
    val carried = bandSums.scanLeft(0L)(_ + _._2)
    val spark = intervals.sparkSession
    import spark.implicits._
    val carryDf = bandSums.zipWithIndex
      .map { case ((b, _), i) => (b, carried(i)) }.toSeq
      .toDF("day_idx", "_carry")
    // delta-0 sentinel at each day's start; d=0 sorts after same-instant
    // −1s, so its cum is the true level holding from midnight
    val dayStarts = carryDf.select(col("day_idx"),
      (col("day_idx") * DayUs).as("ts_us"), lit(0L).as("d"),
      lit(null).cast(pts.schema("_tie").dataType).as("_tie"))
    val w = Window.partitionBy(col("day_idx"))
      .orderBy(col("ts_us"), col("d"), col("_tie"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wDay = Window.partitionBy(col("day_idx"))
    pts.unionByName(dayStarts)
      .join(broadcast(carryDf), "day_idx")
      .withColumn("cum", col("_carry") + sum(col("d")).over(w))
      .withColumn("_peak", max(col("cum")).over(wDay))
      .filter(col("cum") === col("_peak"))
      .groupBy(col("day_idx"))
      .agg(max(col("cum")).as("peak"), min(col("ts_us")).as("at_us"))
  }

  /** Exact distinct actives per day over a trailing window of W days —
    * the DAU/WAU/MAU class — WITHOUT a per-window distinct (the naive
    * form re-shuffles every event into each of the W windows it touches
    * and runs W distinct aggregations; at 100 TB that is W full-data
    * shuffles). The trick: dedupe to (key, active-day), then per key turn
    * the sorted day set into DISJOINT coverage intervals — day d covers
    * [d, d+W−1], truncated at the NEXT active day via lead() so
    * overlapping per-key windows never double-count — and a key's
    * contribution to any day is 0 or 1 by construction. Each interval
    * then fans out to at most W day rows (explode of a ≤ W-element
    * sequence), and the answer is a plain map-side-combined count per
    * day: distinct-counting reduced to counting.
    *
    * Scale shape: one dedup shuffle on (key, day) — the only full-data
    * pass; one per-key window (same key hash partitioning reused); a
    * ≤ W× bounded fan-out; one final day-level aggregation whose result
    * is span-bounded (a decade is ~3.7k rows). No global window, no
    * distinct-per-window, no driver compute. Output: (day_idx epoch-days,
    * n_active), days with ≥ 1 covered key only. */
  def slidingDistinctDaily(
      df: DataFrame,
      keyCol: Column,
      tsUsCol: Column,
      windowDays: Int): DataFrame = {
    require(windowDays >= 1, s"windowDays must be >= 1: $windowDays")
    val DayUs = 86400000000L
    val ud = df.select(keyCol.as("_k"),
        call_function("div", tsUsCol - pmod(tsUsCol, lit(DayUs)), lit(DayUs)).as("_d"))
      .distinct()
    val w = Window.partitionBy(col("_k")).orderBy(col("_d"))
    ud.withColumn("_next", lead(col("_d"), 1).over(w))
      .select(col("_d").as("_s"),
        least(col("_d") + lit(windowDays - 1L),
          coalesce(col("_next") - 1L, col("_d") + lit(windowDays - 1L))).as("_e"))
      .select(explode(sequence(col("_s"), col("_e"))).as("day_idx"))
      .groupBy(col("day_idx")).agg(count(lit(1)).as("n_active"))
  }

  /** Per-key union of overlapping half-open intervals — total covered
    * time and merged-island count (the busy-time / uptime / session-
    * coverage primitive; [[peakConcurrency]] answers "how many at once",
    * this answers "how long at all"). Classic island detection made
    * distributed: per key, sort by (start, end, tie), flag a new island
    * when start exceeds the running max of all PRIOR ends (strictly —
    * touching half-open intervals [a,b)+[b,c) union seamlessly and
    * merge), number islands by a running sum of flags, then aggregate
    * twice. All integer; the tie column makes the row order total so
    * both window passes are deterministic.
    *
    * Scale shape: ONE hash Exchange on the key feeds both window passes
    * (same partitioning + ordering — Spark plans a single sort) and the
    * first groupBy (key, island); per-key data never leaves its
    * partition, no global window, no self-join (the naive overlap
    * formulation is a per-key range self-join — quadratic on a hot key).
    * Output: (key, n_islands, covered_us, n_intervals). */
  def mergedCoverage(
      intervals: DataFrame,
      keyCol: Column,
      startUs: Column,
      endUs: Column,
      tieCol: Column): DataFrame = {
    val base = intervals
      .select(keyCol.as("key"), startUs.as("_s"), endUs.as("_e"), tieCol.as("_t"))
      .filter(col("_s").isNotNull && col("_e").isNotNull)
    val ord = Window.partitionBy(col("key")).orderBy(col("_s"), col("_e"), col("_t"))
    val prevMaxEnd = max(col("_e")).over(ord.rowsBetween(Window.unboundedPreceding, -1))
    base
      .withColumn("_new",
        when(col("_s") > coalesce(prevMaxEnd, lit(Long.MinValue)), 1L).otherwise(0L))
      .withColumn("_isl",
        sum(col("_new")).over(ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("key"), col("_isl"))
      .agg(min(col("_s")).as("_is"), max(col("_e")).as("_ie"), count(lit(1)).as("_n"))
      .groupBy(col("key"))
      .agg(count(lit(1)).as("n_islands"),
        sum(col("_ie") - col("_is")).as("covered_us"),
        sum(col("_n")).as("n_intervals"))
  }

  /** 2-D skyline (Pareto frontier): rows not dominated under (minimize
    * cost, maximize gain) — dominance needs one STRICT inequality, so
    * exact (cost, gain) twins all survive. A row survives iff
    * (a) no strictly-cheaper row has gain ≥ its gain, and (b) it holds
    * its exact-cost group's max gain.
    *
    * The classic sequential algorithm is one sort + a running max; the
    * distributed form never funnels the data through one partition:
    * rows bucket into cost bands of `bandWidth`, per-band gain MAXES
    * (band count is value-range-bounded — AQE-stats-shaped, not a data
    * collect) come back as strictly-lower-band prefix maxes, and the
    * in-band strictly-cheaper max is a per-band RANGE-frame window —
    * the banded prefix pattern of
    * [[graft.operators.Sampling.weightedSystematicSample]] with max in
    * place of sum. Output: (idCol, cost, gain), skyline rows only. */
  def skyline2d(
      df: DataFrame,
      idCol: String,
      costCol: org.apache.spark.sql.Column,
      gainCol: org.apache.spark.sql.Column,
      bandWidth: Long): DataFrame = {
    require(bandWidth > 0, s"bandWidth must be positive: $bandWidth")
    val base = df.select(col(idCol), costCol.cast("long").as("cost"),
        gainCol.cast("long").as("gain"))
      .withColumn("_band", floor(col("cost") / lit(bandWidth.toDouble)).cast("long"))
    val bandMaxes = base.groupBy(col("_band")).agg(max(col("gain")).as("_m"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    // prefix max over strictly lower bands; MinValue = "no lower band"
    val prefix = bandMaxes.scanLeft(Long.MinValue) {
      case (acc, (_, m)) => math.max(acc, m)
    }
    val prefExpr = bandMaxes.zipWithIndex.foldLeft(lit(Long.MinValue)) {
      case (acc, ((b, _), i)) => when(col("_band") === b, lit(prefix(i))).otherwise(acc)
    }
    val wCheaper = Window.partitionBy(col("_band")).orderBy(col("cost"))
      .rangeBetween(Window.unboundedPreceding, -1)
    val wEq = Window.partitionBy(col("cost"))
    base
      .withColumn("_m1", greatest(prefExpr,
        coalesce(max(col("gain")).over(wCheaper), lit(Long.MinValue))))
      .withColumn("_eqmax", max(col("gain")).over(wEq))
      .filter(col("_m1") < col("gain") && col("gain") === col("_eqmax"))
      .select(col(idCol), col("cost"), col("gain"))
  }

  /** Per-group histogram drift between a REFERENCE and a CURRENT frame —
    * the data-drift monitor a training pipeline runs between corpus
    * versions / time windows (the PSI use case, made engine-exact):
    * fixed-width bins (clamped at the edges), then per-bin deviation and
    * chi-square contributions in PURE INTEGER/DECIMAL arithmetic — no
    * ln(), no float division, so the ppm values hash-compare across
    * engines bit-exactly:
    *   dev_ppm  = ⌊|n_ref·tc − n_cur·tr| · 10⁶ / (tr·tc)⌋    (|p−q| ppm)
    *   chi2_ppm = ⌊(n_ref·tc − n_cur·tr)² · 10⁶ /
    *               ((tr·tc)·(n_ref·tc + n_cur·tr))⌋          ((p−q)²/(p+q) ppm)
    * (tr/tc = group totals; the chi-square numerator runs in
    * DECIMAL(38,0) — int64 overflows past ~50k rows/group). Σ dev_ppm
    * over bins = 2·TV distance ppm; Σ chi2_ppm is the χ²-statistic ppm.
    * Empty bins are materialized on BOTH sides (a mass shift into a
    * previously-empty bin is exactly what drift detection must see).
    *
    * Scale shape: two scans → two (group, bin) map-side-combined
    * aggregations (cells = groups × bins, tiny), a broadcast bin grid,
    * and a broadcast per-group totals join. Nothing row-count-sized ever
    * shuffles; the drift frame is O(groups·bins) at any corpus size. */
  /** Per-key Gini impurity of a categorical mix — the log-free diversity
    * index (1 − Σp²): Shannon entropy needs ln() and would tie the
    * result to libm, while Gini is a pure integer cross-ratio, exactly
    * reproducible anywhere. The corpus-composition observability metric
    * (is a day / source / shard dominated by one category?) next to
    * [[histogramDrift]] (distribution shift) and [[ksDrift]] (shape
    * shift). gini_ppm = 10⁶ − floor(Σnᵢ²·10⁶ / n²), carried in
    * DECIMAL(38,0) so nᵢ² never overflows.
    *
    * Scale: two map-side-combined aggregations ((key, cat) counts, then
    * per-key rollup) — nothing row-sized shuffles. Output: (key, n,
    * n_cats, gini_ppm). */
  def giniImpurity(df: DataFrame, keyCol: Column, catCol: Column): DataFrame = {
    df.select(keyCol.as("key"), catCol.as("_c"))
      .groupBy(col("key"), col("_c")).agg(count(lit(1)).as("_n"))
      .groupBy(col("key"))
      .agg(sum(col("_n")).as("n"), count(lit(1)).as("n_cats"),
        sum(expr("CAST(_n AS DECIMAL(38,0)) * _n")).as("_ss"))
      .withColumn("gini_ppm",
        lit(1000000L) -
          expr("CAST(_ss * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
      .select(col("key"), col("n"), col("n_cats"), col("gini_ppm"))
  }

  /** Exact two-sample Kolmogorov–Smirnov distance of every group's value
    * distribution against a designated reference group — the BINLESS
    * drift detector next to [[histogramDrift]] (no bin-placement
    * sensitivity; catches shape shifts χ² bins can wash out). All
    * integer: the sup runs over the pooled distinct value points with
    * right-continuous cumulative counts, and |F_ref − F_g| is cross-
    * multiplied as |cum_ref·n_g − cum_g·n_ref| so no division happens
    * until the final ppm, which goes through DECIMAL(38,0) floor-div
    * (products bounded by n_ref·n_cur < 2⁶³ — holds to ~3·10⁹ rows per
    * side; the ppm path is overflow-safe past that).
    *
    * Scale shape: raw rows collapse to (group, value) counts in one
    * map-side-combined pass — everything after runs on the DISTINCT-
    * VALUE frame, not the row count. Reference counts replicate once
    * per comparison group (a broadcast cross join of the tiny group
    * list), the cumulative sums are per-group windows (no global
    * window), totals ride a broadcast. Output: (group, n_ref, n_cur,
    * ks_ppm). */
  def ksDrift(
      df: DataFrame,
      grpCol: Column,
      valCol: Column,
      refGroup: String): DataFrame =
    driftCumFrame(df, grpCol, valCol, refGroup)
      .groupBy(col("g"))
      .agg(max(col("_nr")).as("n_ref"), max(col("_ng")).as("n_cur"),
        max(abs(col("_fr") * col("_ng") - col("_fg") * col("_nr"))).as("_md"))
      .withColumn("ks_ppm",
        when(col("n_ref") > 0 && col("n_cur") > 0,
          expr("CAST(_md AS DECIMAL(38,0)) * 1000000 DIV " +
            "(CAST(n_ref AS DECIMAL(38,0)) * n_cur)").cast("long"))
          .otherwise(0L))
      .select(col("g"), col("n_ref"), col("n_cur"), col("ks_ppm"))

  /** Shared census machinery of [[ksDrift]] and [[cvmDrift]]: per
    * comparison group, the pooled distinct-value frame with
    * right-continuous cumulative counts (_fr/_fg), per-value counts
    * (_cr/_cg), and side totals (_nr/_ng). Raw rows collapse to
    * (group, value) counts in one map-side pass; everything after runs
    * on the distinct-value frame. */
  private def driftCumFrame(
      df: DataFrame,
      grpCol: Column,
      valCol: Column,
      refGroup: String): DataFrame = {
    val base = df.select(grpCol.as("g"), valCol.as("_v"))
    val refCnt = base.filter(col("g") === refGroup)
      .groupBy(col("_v")).agg(count(lit(1)).as("_cr"))
    val curCnt = base.filter(col("g") =!= refGroup)
      .groupBy(col("g"), col("_v")).agg(count(lit(1)).as("_cg"))
    val groups = curCnt.select(col("g")).distinct()
    val merged = refCnt.crossJoin(broadcast(groups))
      .join(curCnt, Seq("g", "_v"), "full_outer")
      .na.fill(0L, Seq("_cr", "_cg"))
    val w = Window.partitionBy(col("g")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val nr = refCnt.agg(coalesce(sum(col("_cr")), lit(0L)).as("_nr"))
    val ng = curCnt.groupBy(col("g")).agg(sum(col("_cg")).as("_ng"))
    merged
      .withColumn("_fr", sum(col("_cr")).over(w))
      .withColumn("_fg", sum(col("_cg")).over(w))
      .join(broadcast(ng), Seq("g"))
      .crossJoin(broadcast(nr))
  }

  /** Exact two-sample Cramér–von Mises statistic of every group against
    * the reference — the INTEGRATED companion to [[ksDrift]]'s sup:
    * KS sees only the single worst CDF gap, CvM charges for the whole
    * area between the curves (Anderson 1962), so a distribution that
    * differs a little EVERYWHERE scores high here and low on KS. With
    * pooled per-value multiplicities c = c_r + c_g:
    *
    *   T = n_r·n_g/(n_r+n_g)² · Σ c·(F_r − F_g)²
    *   T_ppm = 10⁶ · Σ c·(f_r·n_g − f_g·n_r)² DIV (n_r·n_g·(n_r+n_g)²)
    *
    * — cross-multiplied like KS, summed in DECIMAL(38,0), ONE floor
    * division. Per-term bound (f·n)² caps exactness at ~10⁹ rows per
    * side (tighter than KS's ~3·10⁹ because of the square). Same scale
    * shape as [[ksDrift]]: one map-side census, distinct-value-frame
    * windows, broadcast totals. Output: (g, n_ref, n_cur, cvm_ppm). */
  def cvmDrift(
      df: DataFrame,
      grpCol: Column,
      valCol: Column,
      refGroup: String): DataFrame =
    driftCumFrame(df, grpCol, valCol, refGroup)
      .groupBy(col("g"))
      .agg(max(col("_nr")).as("n_ref"), max(col("_ng")).as("n_cur"),
        sum(expr(
          """CAST(_cr + _cg AS DECIMAL(38,0)) *
            |  (CAST(_fr AS DECIMAL(38,0)) * _ng - CAST(_fg AS DECIMAL(38,0)) * _nr) *
            |  (CAST(_fr AS DECIMAL(38,0)) * _ng - CAST(_fg AS DECIMAL(38,0)) * _nr)""".stripMargin))
          .as("_s"))
      .withColumn("cvm_ppm",
        when(col("n_ref") > 0 && col("n_cur") > 0, expr(
          """CAST(_s * 1000000
            |  DIV (CAST(n_ref AS DECIMAL(38,0)) * n_cur
            |       * (n_ref + n_cur) * (n_ref + n_cur)) AS BIGINT)""".stripMargin))
          .otherwise(0L))
      .select(col("g"), col("n_ref"), col("n_cur"), col("cvm_ppm"))

  def histogramDrift(
      ref: DataFrame,
      cur: DataFrame,
      byCol: String,
      valueCol: String,
      lo: Double,
      binWidth: Double,
      bins: Int): DataFrame = {
    require(bins >= 2 && binWidth > 0, s"need >= 2 bins ($bins), width > 0 ($binWidth)")
    def bin(c: Column): Column =
      least(greatest(floor((c - lit(lo)) / lit(binWidth)), lit(0.0)),
        lit((bins - 1).toDouble)).cast("long")
    def hist(df: DataFrame, n: String): DataFrame =
      df.select(col(byCol).as("g"), bin(col(valueCol)).as("bin"))
        .groupBy(col("g"), col("bin")).agg(count(lit(1)).as(n))
    driftFromHists(hist(ref, "n_ref"), hist(cur, "n_cur"), bins)
  }

  /** Drift arithmetic over PRE-AGGREGATED (g, bin, count) histograms —
    * the tail [[histogramDrift]] shares with the streaming twin
    * (Replay.driftReplay maintains the histograms as a summed census;
    * counts merge associatively, so the maintained view feeds this
    * identically to the batch pass). */
  def driftFromHists(r: DataFrame, c: DataFrame, bins: Int): DataFrame = {
    val grid = r.select(col("g")).union(c.select(col("g"))).distinct()
      .crossJoin(broadcast(
        r.sparkSession.range(bins).select(col("id").as("bin"))))
    val cells = grid.join(r, Seq("g", "bin"), "left")
      .join(c, Seq("g", "bin"), "left")
      .na.fill(0L, Seq("n_ref", "n_cur"))
    val totals = cells.groupBy(col("g"))
      .agg(sum(col("n_ref")).as("_tr"), sum(col("n_cur")).as("_tc"))
    val diff = col("n_ref") * col("_tc") - col("n_cur") * col("_tr")
    val dec = "DECIMAL(38,0)"
    cells.join(broadcast(totals), Seq("g"))
      .withColumn("dev_ppm",
        when(col("_tr") > 0 && col("_tc") > 0,
          call_function("div", abs(diff) * 1000000L, col("_tr") * col("_tc")))
          .otherwise(0L))
      .withColumn("chi2_ppm",
        when(col("_tr") > 0 && col("_tc") > 0 &&
            col("n_ref") * col("_tc") + col("n_cur") * col("_tr") > 0,
          expr(s"(CAST(n_ref*_tc - n_cur*_tr AS $dec) * (n_ref*_tc - n_cur*_tr) * 1000000) DIV " +
            s"(CAST(_tr*_tc AS $dec) * (n_ref*_tc + n_cur*_tr))").cast("long"))
          .otherwise(0L))
      .select(col("g"), col("bin"), col("n_ref"), col("n_cur"),
        col("dev_ppm"), col("chi2_ppm"))
  }

  /** EXACT global quantiles by two-pass distributed selection — the
    * scale-correct way to take an exact k-th order statistic of a column
    * a window over one partition cannot hold (the [[nearestRankPercentiles]]
    * per-key window needs every key's rows in one partition; a GLOBAL
    * rank would funnel 100 TB through one task, and GK/t-digest sketches
    * are approximate):
    *
    *   pass 1 — map-side-combinable histogram of `value div binWidth`
    *            (bin count is DOMAIN-bounded: span/binWidth rows, the
    *            band-count collect class, independent of row count);
    *   driver — prefix-sum the bins, locate each nearest-rank target
    *            (rank = ⌈n·p/100⌉ as (n·p + 99) div 100, pure integer)
    *            as (bin, in-bin offset);
    *   pass 2 — rescan ONLY rows of the few target bins (pushed-down
    *            IN-list), rank inside each bin (a per-bin window over
    *            ~n/bins rows), pick each offset row.
    *
    * Output: (pct, n, <valCol>) per requested percent, exact. */
  def exactQuantilesSelect(
      df: DataFrame,
      valCol: String,
      percents: Seq[Int],
      binWidth: Long = 16L): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in 1..100: $percents")
    require(binWidth >= 1, s"binWidth must be >= 1: $binWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val ps = percents.distinct.sorted // duplicate percents = duplicate output rows
    val v = df.select(col(valCol).cast("long").as("_v"))
      .withColumn("_bin", expr(s"_v DIV $binWidth"))
    val hist = v.groupBy(col("_bin")).agg(count(lit(1)).as("_c"))
      .orderBy(col("_bin"))
      .as[(Long, Long)].collect() // domain-bounded: span/binWidth rows
    val n = hist.map(_._2).sum
    if (n == 0L) // empty input: no rank exists — empty frame, same schema
      return Seq.empty[(Long, Long, Long)].toDF("pct", "n", valCol)
    val targets = ps.map { p =>
      val rank = (n * p + 99) / 100
      var cum = 0L
      var i = 0
      while (cum + hist(i)._2 < rank) { cum += hist(i)._2; i += 1 }
      (p.toLong, hist(i)._1, rank - cum) // (pct, bin, offset within bin)
    }
    val tdf = targets.toDF("pct", "_bin", "_off")
    val wBin = Window.partitionBy(col("_bin")).orderBy(col("_v"))
    v.filter(col("_bin").isin(targets.map(_._2).distinct: _*))
      .withColumn("_r", row_number().over(wBin))
      .join(broadcast(tdf), Seq("_bin"))
      .filter(col("_r") === col("_off"))
      .select(col("pct"), lit(n).as("n"), col("_v").as(valCol))
      .orderBy("pct")
  }

  /** EXACT WEIGHTED quantiles by the same two-pass distributed selection
    * as [[exactQuantilesSelect]] — the selection a DSIR-style weighted
    * corpus needs (each row carries an integer importance weight; the
    * p-quantile is the smallest value whose cumulative weight reaches
    * ⌈W·p/100⌉): pass 1's histogram sums WEIGHT per domain-bounded bin,
    * the driver prefix-sum walks weighted mass to locate each target as
    * (bin, in-bin weight offset), and pass 2 rescans only the target
    * bins, crossing each bin's value-ordered cumulative weight at the
    * offset. Rows in a tie share a value, so whichever tied row crosses,
    * the emitted VALUE is deterministic. Weights must be ≥ 1 (zero-
    * weight rows contribute no mass — filter them out; enforced
    * fail-fast). Output: (pct, n_weight, <valCol>), exact. */
  def weightedQuantileSelect(
      df: DataFrame,
      valCol: String,
      weightCol: String,
      percents: Seq[Int],
      binWidth: Long = 16L): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in 1..100: $percents")
    require(binWidth >= 1, s"binWidth must be >= 1: $binWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val ps = percents.distinct.sorted
    val v = df.select(col(valCol).cast("long").as("_v"),
        col(weightCol).cast("long").as("_w"))
      .withColumn("_bin", expr(s"_v DIV $binWidth"))
    val hist = v.groupBy(col("_bin"))
      .agg(sum(col("_w")).as("_c"), min(col("_w")).as("_wmin"))
      .orderBy(col("_bin"))
      .as[(Long, Long, Long)].collect() // domain-bounded: span/binWidth rows
    require(hist.forall(_._3 >= 1L),
      s"weights must be >= 1 (min seen: ${hist.map(_._3).sorted.headOption})")
    val n = hist.map(_._2).sum
    if (n == 0L)
      return Seq.empty[(Long, Long, Long)].toDF("pct", "n_weight", valCol)
    val targets = ps.map { p =>
      val rank = (n * p + 99) / 100
      var cum = 0L
      var i = 0
      while (cum + hist(i)._2 < rank) { cum += hist(i)._2; i += 1 }
      (p.toLong, hist(i)._1, rank - cum) // (pct, bin, weight offset in bin)
    }
    val tdf = targets.toDF("pct", "_bin", "_off")
    val wBin = Window.partitionBy(col("_bin")).orderBy(col("_v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v.filter(col("_bin").isin(targets.map(_._2).distinct: _*))
      .withColumn("_cw", sum(col("_w")).over(wBin))
      .join(broadcast(tdf), Seq("_bin"))
      .filter(col("_cw") >= col("_off") && col("_cw") - col("_w") < col("_off"))
      .select(col("pct"), lit(n).as("n_weight"), col("_v").as(valCol))
      .orderBy("pct")
  }

  /** Cochran–Armitage trend test per group — "does the success rate
    * TREND with an ordered dose?", the right test when categories are
    * ordinal (hour bands, exposure levels, dose deciles): a χ²
    * independence test ignores the ordering and wastes its power across
    * k−1 df; CA spends one df on the linear trend. With per-(group,
    * dose w) counts n_w and successes r_w, N = Σn, R = Σr:
    *
    *   T′ = N·Σw·r − R·Σw·n          (N× the classic statistic)
    *   D  = N·Σw²·n − (Σw·n)²
    *   z² = T′²·N / (R·(N−R)·D)
    *
    * — every term an integer, the ppm rendering ONE DECIMAL(38,0)
    * floor-division. Degenerate groups (all-success, all-failure, or a
    * single dose level ⇒ D = 0) report NULL. DECIMAL bound: T′² ~
    * (N²·w·p̄)² — exact to ~10⁸ rows per group at doses ≤ 100; past
    * that stratify (by day) and combine.
    *
    * Scale shape: one map-side-combined (group, dose) census (dose is
    * DOMAIN-bounded), one per-group rollup — nothing row-sized
    * shuffles twice. Output: (g, n, n_pos, dir_sign, z2_ppm). */
  def cochranArmitage(
      df: DataFrame,
      groupCol: Column,
      doseCol: Column,
      posCol: Column): DataFrame = {
    val census = df
      .select(groupCol.as("_g"), doseCol.cast("long").as("_w"),
        posCol.cast("long").as("_p"))
      .groupBy(col("_g"), col("_w"))
      .agg(count(lit(1)).as("_n"), sum(col("_p")).as("_r"))
    census.groupBy(col("_g"))
      .agg(sum(col("_n")).as("n"), sum(col("_r")).as("n_pos"),
        sum(col("_w") * col("_n")).as("_swn"),
        sum(col("_w") * col("_r")).as("_swr"),
        sum(col("_w") * col("_w") * col("_n")).as("_sw2n"))
      .withColumn("_t", expr(
        "CAST(n AS DECIMAL(38,0)) * _swr - CAST(n_pos AS DECIMAL(38,0)) * _swn"))
      .withColumn("_d", expr(
        "CAST(n AS DECIMAL(38,0)) * _sw2n - CAST(_swn AS DECIMAL(38,0)) * _swn"))
      .withColumn("z2_ppm",
        when(col("n_pos") > 0 && col("n_pos") < col("n") && col("_d") > 0, expr(
          """CAST(_t * _t * n * 1000000
            |  DIV (CAST(n_pos AS DECIMAL(38,0)) * (n - n_pos) * _d) AS BIGINT)""".stripMargin)))
      .select(col("_g").as("g"), col("n"), col("n_pos"),
        when(col("z2_ppm").isNotNull, signum(col("_t")).cast("long")).as("dir_sign"),
        col("z2_ppm"))
  }

  /** QUANTILE NORMALIZATION across groups (the batch-effect correction
    * of bioinformatics / the per-source score alignment of ranking
    * pipelines): each row's value is replaced by the GLOBAL value at the
    * equivalent rank — row at within-group rank r of n_g maps to the
    * global order statistic at rank ⌈r·N/n_g⌉, so every group's
    * normalized distribution is the same (the global one) while
    * within-group order is preserved exactly. Deterministic under ties:
    * both rankings order by (value, id).
    *
    * Scale shape: the global row_number NEVER runs as one unpartitioned
    * window — values band by `value DIV bandWidth` (DOMAIN-bounded band
    * count, the [[exactQuantilesSelect]] histogram contract, enforced by
    * `maxBands`), the driver prefix-sums the band counts (band-count
    * ints, never rows), and per-band windows + the band offset give the
    * exact global rank. The rank-equality join back is one linear
    * shuffle on rank. Per-band task size is value-skew-bounded: size
    * bandWidth so hot values don't collapse into one band. Output:
    * (id, g, <valCol>, norm_<valCol>). */
  def quantileNormalize(
      df: DataFrame,
      idCol: Column,
      groupCol: Column,
      valCol: String,
      bandWidth: Long = 16L,
      maxBands: Int = 200000): DataFrame = {
    require(bandWidth >= 1, s"bandWidth must be >= 1: $bandWidth")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(idCol.cast("long").as("_id"), groupCol.as("_g"),
      col(valCol).cast("long").as("_v"))
    val counts = base.groupBy(expr(s"_v DIV $bandWidth").as("_band"))
      .agg(count(lit(1)).as("_c"))
      .orderBy(col("_band"))
      .as[(Long, Long)].collect() // domain-bounded: span/bandWidth rows
    require(counts.length <= maxBands,
      s"band histogram has ${counts.length} rows > maxBands=$maxBands — " +
        s"raise bandWidth (domain too wide for the banded global rank)")
    val n = counts.map(_._2).sum
    // empty input: keep `g` at the CALLER's group-column type — a
    // hardcoded tuple schema would make the empty branch diverge from
    // the non-empty one and break downstream unions/typed consumers
    if (n == 0L)
      return base.limit(0)
        .select(col("_id").as("id"), col("_g").as("g"),
          col("_v").as(valCol), col("_v").as(s"norm_$valCol"))
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _)).toSeq
    val offDf = offsets.toDF("_band", "_off")
    val wBand = Window.partitionBy(col("_band")).orderBy(col("_v"), col("_id"))
    val global = base
      .withColumn("_band", expr(s"_v DIV $bandWidth"))
      .withColumn("_rnb", row_number().over(wBand))
      .join(broadcast(offDf), Seq("_band"))
      .select(col("_v").as("_gv"), (col("_rnb") + col("_off")).as("_rn"))
    val ng = base.groupBy(col("_g")).agg(count(lit(1)).as("_ng"))
    val wG = Window.partitionBy(col("_g")).orderBy(col("_v"), col("_id"))
    base
      .withColumn("_r", row_number().over(wG).cast("long"))
      .join(broadcast(ng), Seq("_g"))
      // DECIMAL(38,0) clearing: r·N overflows BIGINT past ~3e9 rows
      .withColumn("_rn", expr(
        s"CAST((CAST(_r AS DECIMAL(38,0)) * ${n}L + _ng - 1) DIV _ng AS BIGINT)"))
      .join(global, Seq("_rn"))
      .select(col("_id").as("id"), col("_g").as("g"),
        col("_v").as(valCol), col("_gv").as(s"norm_$valCol"))
  }

  /** Decision-stump feature screening by EXACT Gini impurity: for every
    * candidate threshold t on an integer-binned feature, the weighted
    * impurity of the (feature ≤ t | feature > t) split on a binary
    * label — the split a tree learner's first node would take, and the
    * cheap "does this feature carry signal at all?" filter a training
    * pipeline runs before expensive model fits. All-rational arithmetic:
    * gini_L = (n_L² − pos_L² − neg_L²)/n_L², weighted sum cleared over
    * the common denominator n_L·n_R·N in ONE DECIMAL(38,0) floor
    * division to ppm (exact to ~10¹⁰ rows).
    *
    * Scale shape: ONE map-side (bin) census (bin domain-bounded —
    * REQUIRE the feature pre-binned, never raw doubles), cumulative
    * left-counts via a broadcast bin×bin self-join on the census (≤B²
    * rows, no unpartitioned window), thresholds ranked by TakeOrdered.
    * Output: top-k (threshold, n_left, impurity_ppm, gain_ppm) by
    * impurity asc — gain vs the unsplit baseline (N² − P² − Q²)/N². */
  def giniSplitGain(
      df: DataFrame,
      binCol: Column,
      posCol: Column,
      topK: Int = 5): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val census = df
      .select(binCol.cast("long").as("_b"), posCol.cast("long").as("_p"))
      .groupBy(col("_b"))
      .agg(count(lit(1)).as("_n"), sum(col("_p")).as("_r"))
    val tot = census.agg(sum(col("_n")).as("_tn"), sum(col("_r")).as("_tr"))
    census.as("a")
      .join(broadcast(census.as("b")), col("b._b") <= col("a._b"))
      .groupBy(col("a._b").as("threshold"))
      .agg(sum(col("b._n")).as("n_left"), sum(col("b._r")).as("_pl"))
      .crossJoin(broadcast(tot))
      .filter(col("n_left") < col("_tn")) // right side must be non-empty
      .withColumn("impurity_ppm", expr(
        """CAST((
          |  (CAST(n_left AS DECIMAL(38,0)) * n_left
          |     - CAST(_pl AS DECIMAL(38,0)) * _pl
          |     - CAST(n_left - _pl AS DECIMAL(38,0)) * (n_left - _pl)) * (_tn - n_left)
          |  + (CAST(_tn - n_left AS DECIMAL(38,0)) * (_tn - n_left)
          |     - CAST(_tr - _pl AS DECIMAL(38,0)) * (_tr - _pl)
          |     - CAST((_tn - n_left) - (_tr - _pl) AS DECIMAL(38,0))
          |         * ((_tn - n_left) - (_tr - _pl))) * n_left
          |) * 1000000
          |  DIV (CAST(n_left AS DECIMAL(38,0)) * (_tn - n_left) * _tn) AS BIGINT)""".stripMargin))
      .withColumn("gain_ppm", expr(
        """CAST((CAST(_tn AS DECIMAL(38,0)) * _tn
          |       - CAST(_tr AS DECIMAL(38,0)) * _tr
          |       - CAST(_tn - _tr AS DECIMAL(38,0)) * (_tn - _tr)) * 1000000
          |  DIV (CAST(_tn AS DECIMAL(38,0)) * _tn) AS BIGINT)""".stripMargin)
        - col("impurity_ppm"))
      .select(col("threshold"), col("n_left"), col("impurity_ppm"), col("gain_ppm"))
      .orderBy(col("impurity_ppm"), col("threshold"))
      .limit(topK)
  }

  /** Benford expected first-digit frequencies, floor(log10(1+1/d)·10⁶):
    * COMPILE-TIME literals, so the runtime never touches libm and both
    * engines compare against identical integers. */
  private val BenfordPpm: Seq[(Int, Long)] = Seq(
    1 -> 301029L, 2 -> 176091L, 3 -> 124938L, 4 -> 96910L, 5 -> 79181L,
    6 -> 66946L, 7 -> 57991L, 8 -> 51152L, 9 -> 45757L)

  /** Benford first-significant-digit audit — the classic anomaly screen
    * for "organic" magnitude-spanning quantities (amounts, populations,
    * file sizes): natural multiplicative data leads with digit 1 ~30%
    * of the time; fabricated or truncated data shows up as per-digit
    * deviation. A data-quality operator next to [[Expectations.audit]]
    * (rule violations) and [[histogramDrift]] (distribution shift).
    *
    * First digit extraction is string-free-of-float-formatting: values
    * < 1 are excluded (their first significant digit depends on decimal
    * expansion; the audit targets magnitude data ≥ 1), the rest take
    * substr(1,1) of the INTEGER part's decimal rendering — identical in
    * any engine. Deviation is exact integer: obs_ppm = floor(n_d·10⁶/n)
    * against the literal expectation table; dev_ppm = |obs − exp|.
    *
    * Scale: one map-side-combined 9-group aggregation + a 9-row
    * broadcast join — nothing row-sized shuffles. Output: one row per
    * digit 1..9 (zero-count digits included): (digit, n, obs_ppm,
    * exp_ppm, dev_ppm). */
  def benfordAudit(df: DataFrame, valueCol: Column): DataFrame = {
    val spark = df.sparkSession
    val digits = spark.createDataFrame(BenfordPpm).toDF("digit", "exp_ppm")
    val cnt = df.select(valueCol.as("_v"))
      .filter(col("_v") >= 1)
      .select(substring(floor(col("_v")).cast("long").cast("string"), 1, 1)
        .cast("int").as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("_nd"))
    val tot = cnt.agg(coalesce(sum(col("_nd")), lit(0L)).as("n"))
    digits.join(broadcast(cnt), Seq("digit"), "left")
      .na.fill(0L, Seq("_nd"))
      .crossJoin(broadcast(tot))
      .withColumn("obs_ppm",
        when(col("n") > 0, expr("_nd * 1000000 DIV n")).otherwise(0L))
      .select(col("digit").cast("long").as("digit"), col("n"),
        col("obs_ppm"), col("exp_ppm"),
        abs(col("obs_ppm") - col("exp_ppm")).as("dev_ppm"))
  }

  /** Length-2 sequential-pattern support (PrefixSpan's first level, kept
    * exact): for every ORDERED pair of event types (a, b), the number of
    * entities for which some a-event STRICTLY precedes some b-event, as
    * a fraction of all entities. The sequence-mining complement of
    * [[graft.operators.Dedup]]'s basket rules (q_assoc_rules ignores
    * order) and the free-form generalization of a fixed funnel
    * (q_funnel fixes one (a, b)).
    *
    * KEY REDUCTION — never materialize per-entity event sequences:
    * "∃ a before b" ⟺ min_ts(a) < max_ts(b) for a ≠ b, and
    * min_ts(a) < max_ts(a) for a = b (some strictly-later repeat). So
    * ONE map-side-combined (entity, type) aggregation carrying
    * (min_ts, max_ts) replaces any ordered scan, the per-entity
    * type×type pair join runs on ≤ |types| rows per entity, and
    * simultaneous-timestamp ties are excluded by the strict inequality
    * exactly as "precedes" demands.
    *
    * Scale shape: the (entity, type) agg is the only data-sized pass;
    * the self-join fans ≤ |types|² rows per entity; the final (a, b)
    * rollup and the 1-row entity-count broadcast are domain-bounded.
    * Output: (type_a, type_b, n_entities, support_ppm) for every ordered
    * pair of types CO-OBSERVED by at least one entity — including
    * zero-support pairs (absence of a sequence is a finding). */
  def seqPairSupport(
      df: DataFrame,
      entityCol: Column,
      typeCol: Column,
      tsCol: Column): DataFrame = {
    val spans = df.select(entityCol.as("_e"), typeCol.as("_t"), tsCol.as("_ts"))
      .groupBy(col("_e"), col("_t"))
      .agg(min(col("_ts")).as("_lo"), max(col("_ts")).as("_hi"))
    val tot = spans.agg(count_distinct(col("_e")).as("_n"))
    val pairs = spans.select(col("_e"), col("_t").as("type_a"), col("_lo"))
      .join(spans.select(col("_e"), col("_t").as("type_b"), col("_hi")), Seq("_e"))
      .withColumn("_hit",
        when(col("_lo") < col("_hi"), 1L).otherwise(0L))
      .groupBy(col("type_a"), col("type_b"))
      .agg(sum(col("_hit")).as("n_entities"))
    pairs.crossJoin(broadcast(tot))
      .withColumn("support_ppm", expr("n_entities * 1000000 DIV _n"))
      .select(col("type_a"), col("type_b"), col("n_entities"),
        col("support_ppm"))
  }

  /** Grouped exact quantiles by 2-pass distributed selection — the
    * per-GROUP generalization of [[exactQuantilesSelect]] for
    * LOW-CARDINALITY group keys, where a per-group rank window would
    * funnel each group through ONE task (5 event types at 100 TB = 5
    * tasks doing everything — the exact anti-pattern the global
    * variant exists to avoid):
    *
    *   pass 1 — ONE map-side-combined (group, value div binWidth)
    *            histogram; (groups × bins) rows come to the driver
    *            (domain-bounded, the exactQuantilesSelect contract);
    *   pass 2 — driver prefix-sums locate each (group, pct) target
    *            (bin, in-bin offset); rescan ONLY target-bin rows,
    *            rank inside each (group, bin) — fine-grained keys that
    *            spread across the cluster — and pick the offset rows.
    *
    * Output: (g, pct, n, <valCol>) per group × percent, exact
    * nearest-rank (rank ⌈n·p/100⌉ — identical to the window form).
    * Group keys round-trip the driver as strings — cast upstream.
    *
    * The driver collect is (groups × bins) rows, which is only safe
    * for LOW-CARDINALITY groups — `maxHistRows` ENFORCES that contract
    * instead of documenting it: the collect is bounded by a limit
    * (never more than maxHistRows + 1 rows reach the driver, no extra
    * counting pass) and the call fails fast with the remedy (raise
    * binWidth, pre-bucket the group key, or use the window form) when
    * a caller passes a high-cardinality group column. */
  def groupedExactQuantiles(
      df: DataFrame,
      groupCol: Column,
      valCol: String,
      percents: Seq[Int],
      binWidth: Long,
      maxHistRows: Int = 1 << 20): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p >= 1 && p <= 100),
      s"percents must be in 1..100: $percents")
    require(binWidth >= 1, s"binWidth must be >= 1: $binWidth")
    require(maxHistRows >= 1, s"maxHistRows must be >= 1: $maxHistRows")
    val spark = df.sparkSession
    import spark.implicits._
    val ps = percents.distinct.sorted
    val v = df.select(groupCol.as("_g"), col(valCol).cast("long").as("_v"))
      .withColumn("_bin", expr(s"_v DIV $binWidth"))
    val histRows = v.groupBy(col("_g"), col("_bin")).agg(count(lit(1)).as("_c"))
      .limit(maxHistRows + 1) // driver-memory valve: bounds the collect itself
      .as[(String, Long, Long)].collect()
    require(histRows.length <= maxHistRows,
      s"groupedExactQuantiles: (groups x bins) histogram exceeds maxHistRows=$maxHistRows — " +
        "group cardinality too high for driver-side selection; raise binWidth, " +
        "pre-bucket the group key, or use a per-group rank window instead")
    if (histRows.isEmpty) // empty input: no rank exists in any group
      return Seq.empty[(String, Long, Long, Long)].toDF("g", "pct", "n", valCol)
    val hist = histRows.groupBy(_._1)
    val targets = hist.toSeq.flatMap { case (g, rows) =>
      val bins = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val n = bins.map(_._2).sum
      ps.map { p =>
        val rank = (n * p + 99) / 100
        var cum = 0L; var i = 0
        while (cum + bins(i)._2 < rank) { cum += bins(i)._2; i += 1 }
        (g, p.toLong, n, bins(i)._1, rank - cum)
      }
    }
    val tdf = targets.toDF("_g", "pct", "n", "_bin", "_off")
    val wBin = Window.partitionBy(col("_g"), col("_bin")).orderBy(col("_v"))
    v.join(broadcast(tdf.select(col("_g"), col("_bin")).distinct()), Seq("_g", "_bin"))
      .withColumn("_r", row_number().over(wBin))
      .join(broadcast(tdf), Seq("_g", "_bin"))
      .filter(col("_r") === col("_off"))
      .select(col("_g").as("g"), col("pct"), col("n"), col("_v").as(valCol))
  }

  /** Mann–Whitney U rank-sum test per metric group — [[abTestT2]]'s
    * NONPARAMETRIC companion (one whale user moves a mean; ranks shrug).
    * Variants by entity parity; the test statistic is exact integer end
    * to end:
    *
    *  - doubled tie-averaged ranks r2(v) = 2·rank(v) + (eq(v) − 1)
    *    (rank = first rank of the tie group — one per-group window);
    *  - U2 = Σ_{variant0} r2 − n0(n0+1)  (= 2U);
    *  - normal-approximation z² with the TIE-CORRECTED variance,
    *    divisions cleared:
    *      z2_ppm = ⌊10⁶·3·(U2 − n0n1)²·N(N−1) /
    *               (n0n1·(N(N−1)(N+1) − Σ(t³−t)))⌋
    *    — one DECIMAL(38,0) floor-division; direction ships as
    *    sign(U2 − n0n1). All-tied groups (zero corrected variance)
    *    report NULL.
    *
    * DECIMAL(38,0) bound: the z² numerator is ~(n0n1)²·N²·10⁶ — exact
    * to ~10⁵ entities per group; past that pre-stratify (e.g. per day)
    * and combine, the rank test is group-local anyway.
    *
    * Scale shape: one (group, entity) totals agg (data-sized), one
    * per-group value window for ranks (group is the partition key),
    * one (group, value) tie census, one moment rollup. Output:
    * (g, n0, n1, u2, dir_sign, z2_ppm). */
  def mannWhitneyU(
      df: DataFrame,
      groupCol: Column,
      entityCol: Column,
      valueCol: Column): DataFrame = {
    val per = df.select(groupCol.as("_g"), entityCol.as("_e"), valueCol.as("_x"))
      .groupBy(col("_g"), col("_e"))
      .agg(sum(col("_x")).as("_t"))
      .withColumn("_v0", (col("_e") % 2 === 0).cast("long"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_t"))
    val wEq = Window.partitionBy(col("_g"), col("_t"))
    val ranked = per
      .withColumn("_rk", rank().over(w).cast("long"))
      .withColumn("_eq", count(lit(1)).over(wEq))
      .withColumn("_r2", col("_rk") * 2 + col("_eq") - 1)
    val ties = ranked.groupBy(col("_g"), col("_t"))
      .agg(max(col("_eq")).as("_tc"))
      .groupBy(col("_g"))
      .agg(sum(expr("CAST(_tc AS DECIMAL(38,0)) * _tc * _tc - _tc")).as("_tsum"))
    val m = ranked.groupBy(col("_g"))
      .agg(count(lit(1)).as("_nn"),
        sum(col("_v0")).as("n0"),
        sum(lit(1L) - col("_v0")).as("n1"),
        sum(col("_r2") * col("_v0")).as("_rsum0"))
      .withColumn("u2", col("_rsum0") - col("n0") * (col("n0") + 1))
    m.join(ties, Seq("_g"))
      .withColumn("_num", expr("CAST(u2 AS DECIMAL(38,0)) - CAST(n0 AS DECIMAL(38,0)) * n1"))
      .withColumn("_den", expr(
        """CAST(n0 AS DECIMAL(38,0)) * n1 *
          |(CAST(_nn AS DECIMAL(38,0)) * (_nn - 1) * (_nn + 1) - _tsum)""".stripMargin))
      .withColumn("z2_ppm",
        when(col("_den") > 0,
          expr("CAST(3 * _num * _num * _nn * (_nn - 1) * 1000000 DIV _den AS BIGINT)")))
      .select(col("_g").as("g"), col("n0"), col("n1"), col("u2"),
        signum(col("_num")).cast("long").as("dir_sign"), col("z2_ppm"))
  }

  /** Exact isotonic calibration curve (probability calibration — the
    * reliability-diagram repair step before thresholding a score): fit
    * the monotone-non-decreasing rate curve over score bins that
    * minimizes weighted squared error. Instead of the SEQUENTIAL
    * pool-adjacent-violators stack (a driver loop, or a fold that
    * cannot parallelize), this uses the MINIMAX characterization of
    * the isotonic fit:
    *
    *   fit_i = max_{j ≤ i} min_{k ≥ i} mean(y over bins j..k)
    *
    * which is pure relational algebra over the BIN frame — and bins are
    * domain-bounded, so the O(bins²) interval frame and O(bins³) rows
    * that realize the max-min are tiny at any corpus size. The ONE
    * data-sized pass is the (bin) aggregation.
    *
    * ENGINE-EXACT: interval means are floor-ppm integers
    * (Σpos·10⁶ DIV Σn), and floor is monotone so it commutes with both
    * the min and the max — the emitted fit_ppm equals the floor-ppm of
    * the true rational PAVA fit (per-bin pooled-block mean) exactly.
    * Empty bins never appear (they carry no evidence, the standard
    * isotonic convention); the fit is non-decreasing in the bin order
    * by construction.
    *
    * Input: rows with (bin, pos ∈ {0, 1}). Output: one row per
    * non-empty bin — (bin, n, n_pos, raw_ppm, iso_ppm). */
  def isotonicCalibration(
      df: DataFrame,
      binCol: Column,
      posCol: Column): DataFrame = {
    val bins = df.select(binCol.as("bin"), posCol.cast("long").as("_p"))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("_p")).as("n_pos"))
    val b = bins.select(col("bin").as("_b"), col("n").as("_n"),
      col("n_pos").as("_np"))
    val ivals = b.select(col("_b").as("_j"))
      .join(b.select(col("_b").as("_k")), col("_j") <= col("_k"))
      .join(b, col("_b") >= col("_j") && col("_b") <= col("_k"))
      .groupBy(col("_j"), col("_k"))
      .agg(expr("sum(_np) * 1000000 DIV sum(_n)").as("_mean_ppm"))
    val mins = ivals
      .join(b.select(col("_b").as("_i")),
        col("_j") <= col("_i") && col("_k") >= col("_i"))
      .groupBy(col("_i"), col("_j")).agg(min(col("_mean_ppm")).as("_mn"))
    val fit = mins.groupBy(col("_i")).agg(max(col("_mn")).as("iso_ppm"))
    bins.join(fit, col("bin") === col("_i"))
      .select(col("bin"), col("n"), col("n_pos"),
        expr("n_pos * 1000000 DIV n").as("raw_ppm"), col("iso_ppm"))
  }

  /** Two-sample pooled-variance t² per metric — the A/B-experiment
    * readout: entities split into variants by a deterministic id hash,
    * per-entity metric totals compared between variants. Reported as
    * the SQUARED t statistic (t² ~ F(1, n−2), so t² ≥ 3.84 ⇒ p < 0.05
    * at large n; consumers threshold on t² exactly as they would on
    * |t|), because t itself carries a sqrt.
    *
    * ENGINE-EXACT: with per-variant (n, S = Σx, Q = Σx²) over integer
    * metric values,
    *
    *   t² = (S₀n₁ − S₁n₀)²·(n₀+n₁−2) /
    *        ((n₁(n₀Q₀ − S₀²) + n₀(n₁Q₁ − S₁²))·(n₀+n₁))
    *
    * — the textbook pooled form with every division cleared, so
    * t2_ppm = floor(10⁶·t²) is ONE DECIMAL(38,0) floor-division.
    * Zero pooled variance (all values equal) reports NULL — "no
    * within-group noise" is a degenerate test, not t² = 0. The mean
    * difference's SIGN ships alongside (mean_diff_sign = sign of
    * x̄₀ − x̄₁) so direction survives the squaring.
    *
    * DECIMAL(38,0) bound: the numerator is (S·n)²·n·10⁶ — exact while
    * |S|·n ≲ 10¹⁵·√n (e.g. metric mass 10¹⁰ mils over 10⁶ entities);
    * rescale the metric unit upstream past that, the test statistic is
    * unit-invariant.
    *
    * Scale shape: one (group, entity) metric-total aggregation (the
    * data-sized pass — map-side-combined), then one (group, variant)
    * moment aggregation and a row-local formula on the per-group frame.
    * Entities missing a metric must already carry explicit zero rows if
    * they should count — this operator tests the rows it is given.
    * Input: (g, e, x) = (metric group, entity, integer value); variant
    * = entity % 2. Output: (g, n0, n1, s0, s1, mean_diff_sign, t2_ppm). */
  def abTestT2(
      df: DataFrame,
      groupCol: Column,
      entityCol: Column,
      valueCol: Column): DataFrame = {
    val per = df.select(groupCol.as("_g"), entityCol.as("_e"), valueCol.as("_x"))
      .groupBy(col("_g"), col("_e"))
      .agg(sum(col("_x")).as("_t"))
      .withColumn("_v", (col("_e") % 2 === 0).cast("int"))
    val m = per.groupBy(col("_g"))
      .agg(
        sum(col("_v")).cast("long").as("n0"),
        sum(lit(1) - col("_v")).cast("long").as("n1"),
        sum(col("_t") * col("_v")).as("s0"),
        sum(col("_t") * (lit(1) - col("_v"))).as("s1"),
        sum(expr("CAST(_t AS DECIMAL(38,0)) * _t * _v")).as("_q0"),
        sum(expr("CAST(_t AS DECIMAL(38,0)) * _t * (1 - _v)")).as("_q1"))
    m.withColumn("_num", expr("CAST(s0 AS DECIMAL(38,0)) * n1 - CAST(s1 AS DECIMAL(38,0)) * n0"))
      .withColumn("_ss", expr(
        """n1 * (n0 * _q0 - CAST(s0 AS DECIMAL(38,0)) * s0) +
          |n0 * (n1 * _q1 - CAST(s1 AS DECIMAL(38,0)) * s1)""".stripMargin))
      .withColumn("t2_ppm",
        when(col("n0") + col("n1") > 2 && col("_ss") > 0,
          expr("CAST(_num * _num * (n0 + n1 - 2) * 1000000 DIV (_ss * (n0 + n1)) AS BIGINT)")))
      .select(col("_g").as("g"), col("n0"), col("n1"), col("s0"), col("s1"),
        signum(col("_num")).cast("long").as("mean_diff_sign"), col("t2_ppm"))
  }

  /** Spearman rank correlation per group — the monotone-association
    * readout over two per-entity metrics ([[mannWhitneyU]]'s two-sided
    * sibling: ranks make one whale entity a single rank step, not a
    * lever arm). Tie handling is the textbook tie-averaged rank,
    * carried as DOUBLED ranks r2 = 2·rank + eq − 1 (integers even when
    * the tie-average is a half), then Spearman-with-ties = Pearson on
    * the r2 values:
    *
    *   num  = n·Σxy − Σx·Σy,  denx = n·Σx² − (Σx)²,  deny likewise,
    *   rho² = num² / (denx·deny)
    *
    * shipped as rho2_ppm = ((num² DIV denx) · 10⁶) DIV deny — two
    * floored divisions instead of one because 10⁶·num² can exceed
    * DECIMAL(38,0)/HUGEINT; floor∘floor composes deterministically and
    * under-approximates the single division by < 10⁶/denx + 1 (≪ 1 ppm
    * at any real n), with the IDENTICAL arithmetic replayed by the
    * oracle. Direction ships as sign(num); constant-metric groups
    * (zero variance) report NULL.
    *
    * DECIMAL(38,0) bound: num ≲ 4n³ so num² ≲ 16n⁶ — exact to ~10⁵
    * entities per group; past that pre-stratify, as with
    * [[mannWhitneyU]].
    *
    * Scale shape: one (group, entity) totals pass upstream of this
    * call; here two per-group value windows for the ranks (group is
    * the partition key — both windows and the final aggregation reuse
    * ONE hash partitioning on _g) and one moment rollup. Output:
    * (g, n, dir_sign, rho2_ppm). */
  def spearmanRho(
      df: DataFrame,
      groupCol: Column,
      xCol: Column,
      yCol: Column): DataFrame = {
    val per = df.select(groupCol.as("_g"), xCol.as("_x"), yCol.as("_y"))
    val wX = Window.partitionBy(col("_g")).orderBy(col("_x"))
    val wXeq = Window.partitionBy(col("_g"), col("_x"))
    val wY = Window.partitionBy(col("_g")).orderBy(col("_y"))
    val wYeq = Window.partitionBy(col("_g"), col("_y"))
    val ranked = per
      .withColumn("_rx", rank().over(wX).cast("long") * 2 + count(lit(1)).over(wXeq) - 1)
      .withColumn("_ry", rank().over(wY).cast("long") * 2 + count(lit(1)).over(wYeq) - 1)
    val m = ranked.groupBy(col("_g")).agg(
      count(lit(1)).as("n"),
      sum(col("_rx")).as("_sx"), sum(col("_ry")).as("_sy"),
      sum(expr("CAST(_rx AS DECIMAL(38,0)) * _rx")).as("_sxx"),
      sum(expr("CAST(_ry AS DECIMAL(38,0)) * _ry")).as("_syy"),
      sum(expr("CAST(_rx AS DECIMAL(38,0)) * _ry")).as("_sxy"))
    m.withColumn("_num", expr("n * _sxy - CAST(_sx AS DECIMAL(38,0)) * _sy"))
      .withColumn("_dx", expr("n * _sxx - CAST(_sx AS DECIMAL(38,0)) * _sx"))
      .withColumn("_dy", expr("n * _syy - CAST(_sy AS DECIMAL(38,0)) * _sy"))
      .withColumn("rho2_ppm",
        // Spark's DIV returns LONG even for DECIMAL operands, and
        // t1·10⁶ (t1 ≲ 4n⁴) overflows long past n ≈ 5·10³ — re-widen
        // the quotient to DECIMAL(38,0) before the ppm scale
        when(col("_dx") > 0 && col("_dy") > 0,
          expr("CAST(CAST(_num * _num DIV _dx AS DECIMAL(38,0)) * 1000000 DIV _dy AS BIGINT)")))
      .select(col("_g").as("g"), col("n"),
        signum(col("_num")).cast("long").as("dir_sign"), col("rho2_ppm"))
  }

  /** Poisson(1) inverse CDF as cumulative ppm thresholds — COMPILE-TIME
    * literals (floor(10⁶·Σ_{i≤k} e⁻¹/i!)), so the runtime never touches
    * exp/factorial and both engines compare a uniform draw against
    * identical integers. */
  private[graft] val PoissonPpm: Seq[Long] =
    Seq(367879L, 735758L, 919698L, 981011L, 996340L, 999405L, 999916L,
      999989L, 999998L, 999999L)

  /** The resample-weight expression both [[bootstrapCiMean]] and its
    * oracle share: uniform ppm draw → Poisson(1) count via the literal
    * threshold ladder. */
  private def poissonWeight(u: Column): Column =
    PoissonPpm.zipWithIndex.foldRight(lit(PoissonPpm.size.toLong)) {
      case ((thr, k), alt) => when(u < thr, k.toLong).otherwise(alt)
    }

  /** Poisson-bootstrap confidence interval for a per-group mean — THE
    * distributed bootstrap: a classical resample draws n entities WITH
    * replacement (needs global coordination), but each entity's
    * multiplicity in one resample is asymptotically Poisson(1) — so B
    * resamples materialize as B independent per-ROW weights, computed
    * locally from a seeded hash, no shuffle of identities at all.
    *
    * Deterministic end to end: the per-(entity, b) uniform draw is the
    * 48-bit md5 prefix mod 10⁶ (the q_table_checksum rendering — both
    * engines hash the same string), the Poisson(1) inverse CDF is the
    * [[PoissonPpm]] literal ladder, resample means are floor-divisions
    * of integer sums, and the CI bounds are exact nearest-rank p5/p95
    * SELECTED from the B means (rank ⌈B_eff·q/100⌉) — no float
    * anywhere, so the oracle replays the identical trail.
    *
    * Scale shape: callers pass the (group, entity, x) TOTALS frame
    * (data-sized aggregation upstream); this explodes it ×B (weights
    * only — B·|totals| narrow rows), map-side-combines to (group, b)
    * partials, and ranks the B means per group on a groups×B frame.
    * Empty resamples (Σw = 0, vanishing for n ≫ 10) are excluded and
    * surfaced via b_eff. Output: (g, n, mean_x, b_eff, lo_x, hi_x). */
  def bootstrapCiMean(
      df: DataFrame,
      groupCol: Column,
      entityCol: Column,
      valueCol: Column,
      b: Int = 32): DataFrame = {
    require(b >= 2, s"b must be >= 2: $b")
    val per = df.select(groupCol.as("_g"), entityCol.as("_e"), valueCol.as("_x"))
    val drawn = per
      .withColumn("_b", explode(sequence(lit(0L), lit((b - 1).toLong))))
      .withColumn("_u",
        conv(substring(md5(concat_ws("|", col("_e"), col("_b"))), 1, 12), 16, 10)
          .cast("long") % 1000000L)
      .withColumn("_w", poissonWeight(col("_u")))
    val means = drawn.groupBy(col("_g"), col("_b"))
      .agg(sum(col("_w") * col("_x")).as("_wx"), sum(col("_w")).as("_wn"))
      .filter(col("_wn") > 0)
      .withColumn("_m", expr("_wx DIV _wn"))
    // rank selection: both windows and the agg share the _g partitioning
    val wRank = Window.partitionBy(col("_g")).orderBy(col("_m"), col("_b"))
    val withB = means.withColumn("_r", row_number().over(wRank))
      .withColumn("_beff", count(lit(1)).over(Window.partitionBy(col("_g"))))
    val sel = withB
      .groupBy(col("_g"))
      .agg(max(col("_beff")).as("b_eff"),
        max(when(col("_r") === expr("CAST((_beff * 5 + 99) DIV 100 AS INT)"), col("_m"))).as("lo_x"),
        max(when(col("_r") === expr("CAST((_beff * 95 + 99) DIV 100 AS INT)"), col("_m"))).as("hi_x"))
    val base = per.groupBy(col("_g"))
      .agg(count(lit(1)).as("n"), sum(col("_x")).as("_sx"))
      .withColumn("mean_x", expr("_sx DIV n"))
    base.join(sel, Seq("_g"))
      .select(col("_g").as("g"), col("n"), col("mean_x"), col("b_eff"),
        col("lo_x"), col("hi_x"))
  }

  /** Kaplan–Meier survival curve per group — the censoring-correct
    * lifetime estimator (mean-of-observed-lifetimes is biased the day
    * entities are still alive at the observation edge; KM discounts the
    * at-risk set instead of dropping the censored). Input: one row per
    * entity with (group, duration, observed ∈ {0,1}) — observed = the
    * terminal event happened; 0 = censored at `duration`.
    *
    *   S(t) = Π_{t_i ≤ t, d_i > 0} (n_i − d_i)/n_i,
    *
    * carried as an integer ppm fold S' = ⌊S·(n−d)/n⌋ over the ordered
    * event times — a rounded recurrence, so (like the EWMA operator) it
    * folds row-locally via sort_array/aggregate after ONE shuffle, and
    * the oracle replays it with a recursive CTE.
    *
    * Scale shape: one map-side-combined (group, duration) census is the
    * only data-sized pass; the at-risk suffix sums, the fold, and the
    * explode all run on the (group × distinct durations) frame —
    * domain-bounded for day-granularity lifetimes. Groups fold
    * independently (100 TB scales as width); within a group the fold is
    * sequential by nature (each step divides by the at-risk count the
    * previous steps determined). Output: one row per (group, duration
    * with deaths): (g, t, n_risk, n_death, s_ppm), s_ppm = S(t)·10⁶. */
  def kaplanMeier(
      df: DataFrame,
      groupCol: Column,
      durationCol: Column,
      observedCol: Column): DataFrame = {
    val census = df
      .select(groupCol.as("_g"), durationCol.cast("long").as("_t"),
        observedCol.cast("long").as("_d"))
      .groupBy(col("_g"), col("_t"))
      .agg(sum(col("_d")).as("_dd"), count(lit(1)).as("_cc"))
    val wSuf = Window.partitionBy(col("_g")).orderBy(col("_t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = census.withColumn("_nr", sum(col("_cc")).over(wSuf))
    val folded = risk.filter(col("_dd") > 0)
      .groupBy(col("_g"))
      .agg(sort_array(collect_list(struct(col("_t"), col("_nr"), col("_dd")))).as("_steps"))
      .withColumn("_s", expr(
        """aggregate(_steps, CAST(array(1000000) AS ARRAY<BIGINT>),
          |  (acc, x) -> concat(acc,
          |    array(element_at(acc, -1) * (x._nr - x._dd) DIV x._nr)))""".stripMargin))
    folded
      .select(col("_g"), col("_s"), posexplode(col("_steps")).as(Seq("_i", "_st")))
      .select(col("_g").as("g"), col("_st._t").as("t"),
        col("_st._nr").as("n_risk"), col("_st._dd").as("n_death"),
        expr("element_at(_s, _i + 2)").as("s_ppm"))
  }

  /** Two-group log-rank test per group — [[kaplanMeier]] draws the two
    * survival curves, this says whether they DIFFER: at each death time
    * the observed group-1 deaths are compared with the hypergeometric
    * expectation under H₀ (no difference),
    *
    *   E₁ += d·n₁/n,   Var += d·n₁·(n−n₁)·(n−d) / (n²·(n−1)),
    *
    * each per-time term floored to an exact integer ppm BEFORE summing
    * (deterministic per row, so the sums are engine-exact), then
    * z2_ppm = (10⁶·O₁ − E₁_ppm)² DIV Var_ppm  (ppm²/ppm = ppm), NULL when the
    * variance is zero (one arm empty or no deaths). The intermediate
    * products run in DECIMAL(38,0) (the [[abTestT2]] int128 stand-in):
    * the variance numerator is bounded by 10⁶·n⁴ ≲ 10²⁶ at a million
    * at-risk entities per group key.
    *
    * Scale shape: one (g, t) census aggregate, one suffix-sum window on
    * the same hash(g) partitioning (risk sets), one final per-g
    * aggregate — the [[kaplanMeier]] plan plus two columns; the census
    * frame is |g|·|distinct t| rows (domain-bounded in days).
    * Input cols: (g, t, d, v) — duration, observed 0/1, variant 0/1.
    * Output: (g, o1, e1_ppm, v_ppm, z2_ppm). */
  def logRank(per: DataFrame): DataFrame = {
    val cen = per.groupBy(col("g"), col("t"))
      .agg(count(lit(1)).as("cc"), sum(col("v")).as("cc1"),
        sum(col("d")).as("dd"), sum(col("d") * col("v")).as("dd1"))
    val wSuf = Window.partitionBy(col("g")).orderBy(col("t"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val risk = cen
      .withColumn("nr", sum(col("cc")).over(wSuf))
      .withColumn("nr1", sum(col("cc1")).over(wSuf))
      .filter(col("dd") > 0)
    risk.groupBy(col("g"))
      .agg(sum(col("dd1")).as("o1"),
        sum(expr("1000000 * dd * nr1 DIV nr")).as("e1_ppm"),
        sum(expr(
          """CASE WHEN nr > 1
            |  THEN CAST(1000000 AS DECIMAL(38,0)) * dd * nr1 * (nr - nr1) * (nr - dd)
            |       DIV (CAST(nr AS DECIMAL(38,0)) * nr * (nr - 1))
            |  ELSE CAST(0 AS BIGINT) END""".stripMargin)).as("v_ppm"))
      .withColumn("z2_ppm", when(col("v_ppm") > 0, expr(
        """(CAST(1000000 AS DECIMAL(38,0)) * o1 - e1_ppm)
          |  * (CAST(1000000 AS DECIMAL(38,0)) * o1 - e1_ppm)
          |  DIV CAST(v_ppm AS DECIMAL(38,0))""".stripMargin)))
      .select(col("g"), col("o1"), col("e1_ppm"), col("v_ppm"), col("z2_ppm"))
  }

  /** One-way ANOVA F statistic over a BALANCED design — the k-arm
    * generalization of [[abTestT2]] (which only compares two variants):
    * are the per-entity metric means across k groups distinguishable at
    * all, before any pairwise readout? Balance comes from the caller
    * feeding a dense group×entity grid (absent cells zero-filled, the
    * [[abTestT2]] convention), so every group has the same entity count
    * n and the F ratio clears to ONE floor-division over integers:
    *
    *   A = k·ΣT_g² − T²   (kn·(k−1)·MSB·n, the between sum, cleared)
    *   B = n·Σx²  − ΣT_g² (n·(N−k)·MSW/(n−1)·…, the within sum, cleared)
    *   F = MSB/MSW = A·(n−1) / ((k−1)·B)
    *
    * f_ppm = floor(10⁶·A·(n−1) / ((k−1)·B)) in DECIMAL(38,0), NULL when
    * the within-variance is zero. Exact to ~10⁵ entities per group with
    * mils-scaled metrics (10⁶·A·(n−1) ≲ 10³⁷); past that pre-aggregate
    * coarser, as with [[spearmanRho]].
    *
    * Scale shape: ONE (group, entity) totals aggregation (map-side
    * combinable) then a k-row moment rollup — nothing else touches data
    * volume. Output: one row (k, n, a, b, f_ppm). */
  def anovaF(df: DataFrame, groupCol: Column, entityCol: Column, valueCol: Column): DataFrame = {
    val per = df.select(groupCol.as("_g"), entityCol.as("_e"), valueCol.as("_x"))
      .groupBy(col("_g"), col("_e"))
      .agg(sum(col("_x")).as("_t"))
    val g = per.groupBy(col("_g"))
      .agg(count(lit(1)).as("_n"), sum(col("_t")).as("_tg"),
        sum(expr("CAST(_t AS DECIMAL(38,0)) * _t")).as("_qg"))
    val m = g.agg(
      count(lit(1)).cast("long").as("k"),
      max(col("_n")).cast("long").as("n"),
      min(col("_n")).cast("long").as("_nmin"),
      sum(col("_tg")).as("_tt"),
      sum(expr("CAST(_tg AS DECIMAL(38,0)) * _tg")).as("_stg2"),
      sum(col("_qg")).as("_sx2"))
    m.withColumn("_bal", expr("n = _nmin"))
      .withColumn("a", expr("CAST(k * _stg2 - CAST(_tt AS DECIMAL(38,0)) * _tt AS DECIMAL(38,0))"))
      .withColumn("b", expr("CAST(n * _sx2 - _stg2 AS DECIMAL(38,0))"))
      .withColumn("f_ppm",
        when(col("_bal") && col("k") > 1 && col("b") > 0,
          expr("CAST(a * (n - 1) * 1000000 DIV ((k - 1) * b) AS BIGINT)")))
      .select(col("k"), col("n"),
        expr("CAST(a AS DECIMAL(38,0))").as("a"),
        expr("CAST(b AS DECIMAL(38,0))").as("b"), col("f_ppm"))
  }

  /** CUPED variance-reduced A/B delta (Deng et al. 2013, WSDM — the
    * standard pre-experiment covariate adjustment): per group, the
    * treatment/control difference of ŷ = y − θ·x where x is each
    * entity's PRE-period metric, computed with θ quantized to ppm so
    * every number stays integral and both engines replay the identical
    * arithmetic:
    *
    *   θ_ppm  = floor(10⁶·(N·Σxy − Σx·Σy) / (N·Σx² − (Σx)²))   (pooled)
    *   Δraw_ppm   = floor(10⁶·(Sy0·n1 − Sy1·n0) / (n0·n1))
    *   Δcuped_ppm = floor((10⁶·(Sy0·n1 − Sy1·n0)
    *                       − θ_ppm·(Sx0·n1 − Sx1·n0)) / (n0·n1))
    *
    * θ is fit POOLED across both arms (the unbiasedness requirement: a
    * per-arm θ re-introduces selection). Variants by entity-id parity,
    * the registry convention. Zero pre-period variance → θ NULL and
    * Δcuped = Δraw. DECIMAL(38,0) throughout; exact to ~10⁶ entities
    * per group at mils-scaled metrics. "floor" here is the engines'
    * shared integer division (Spark DIV ≡ DuckDB //), which truncates
    * toward zero on the negative quotients a losing treatment produces
    * — identical on both sides, so the hash compare holds either way.
    *
    * Scale shape: caller supplies one row per (group, entity) with x
    * and y already totaled (one upstream aggregation); here ONE
    * per-group moment rollup — no second data-sized pass. Output:
    * (g, n0, n1, theta_ppm, delta_raw_ppm, delta_cuped_ppm). */
  def cupedDelta(
      df: DataFrame,
      groupCol: Column,
      entityCol: Column,
      preCol: Column,
      postCol: Column): DataFrame = {
    val per = df.select(groupCol.as("_g"), entityCol.as("_e"),
        preCol.cast("long").as("_x"), postCol.cast("long").as("_y"))
      .withColumn("_v", (col("_e") % 2 === 0).cast("int"))
    val m = per.groupBy(col("_g")).agg(
      count(lit(1)).cast("long").as("_nn"),
      sum(col("_v")).cast("long").as("n0"),
      sum(lit(1) - col("_v")).cast("long").as("n1"),
      sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"),
      sum(expr("CAST(_x AS DECIMAL(38,0)) * _x")).as("_sxx"),
      sum(expr("CAST(_x AS DECIMAL(38,0)) * _y")).as("_sxy"),
      sum(col("_x") * col("_v")).as("_sx0"),
      sum(col("_x") * (lit(1) - col("_v"))).as("_sx1"),
      sum(col("_y") * col("_v")).as("_sy0"),
      sum(col("_y") * (lit(1) - col("_v"))).as("_sy1"))
    m.withColumn("_cd", expr("CAST(_nn * _sxx - CAST(_sx AS DECIMAL(38,0)) * _sx AS DECIMAL(38,0))"))
      .withColumn("_cn", expr("CAST(_nn * _sxy - CAST(_sx AS DECIMAL(38,0)) * _sy AS DECIMAL(38,0))"))
      .withColumn("theta_ppm",
        when(col("_cd") > 0, expr("CAST(_cn * 1000000 DIV _cd AS BIGINT)")))
      .withColumn("delta_raw_ppm",
        when(col("n0") > 0 && col("n1") > 0, expr(
          "CAST((CAST(_sy0 AS DECIMAL(38,0)) * n1 - CAST(_sy1 AS DECIMAL(38,0)) * n0) * 1000000 DIV (n0 * n1) AS BIGINT)")))
      .withColumn("delta_cuped_ppm",
        when(col("n0") > 0 && col("n1") > 0, expr(
          """CAST(((CAST(_sy0 AS DECIMAL(38,0)) * n1 - CAST(_sy1 AS DECIMAL(38,0)) * n0) * 1000000
            |  - coalesce(theta_ppm, 0) * (CAST(_sx0 AS DECIMAL(38,0)) * n1 - CAST(_sx1 AS DECIMAL(38,0)) * n0))
            |  DIV (n0 * n1) AS BIGINT)""".stripMargin)))
      .select(col("_g").as("g"), col("n0"), col("n1"), col("theta_ppm"),
        col("delta_raw_ppm"), col("delta_cuped_ppm"))
  }

  /** Pearson χ² test of independence over an r×c contingency table —
    * the categorical-association omnibus ([[anovaF]] asks it of means;
    * this asks it of co-occurrence counts, e.g. does event mix depend
    * on weekday?). Each cell ships its observed count, its expected
    * count in ppm, and its χ² contribution in ppm, every division
    * cleared to ONE floor per cell:
    *
    *   e_ppm      = 10⁶·R·C DIV N
    *   contrib_ppm = 10⁶·(O·N − R·C)² DIV (N·R·C)
    *
    * (Σ contrib_ppm ≈ 10⁶·χ², under-approximating by < #cells ppm.)
    * DECIMAL(38,0) for the squared term. The output is the FULL r×c
    * grid (margins crossed, observed cells left-joined): a zero cell
    * still contributes R·C/N to χ², and dropping it would understate
    * association — diag-only tables would read V < 1. Scale shape: ONE
    * map-side-combined (row, col) count aggregation over the data,
    * then margins via two domain-bounded re-aggregations of the cell
    * frame, the grid as a margin×margin cross join (domain-bounded)
    * and a broadcast total — nothing else is data-sized.
    * Output: (r, c, o, e_ppm, contrib_ppm), one row per GRID cell. */
  def chi2Contingency(df: DataFrame, rowCol: Column, colCol: Column): DataFrame = {
    val cells = df.select(rowCol.as("r"), colCol.as("c"))
      .groupBy(col("r"), col("c")).agg(count(lit(1)).as("o"))
    val rm = cells.groupBy(col("r")).agg(sum(col("o")).as("_rr"))
    val cm = cells.groupBy(col("c")).agg(sum(col("o")).as("_cc"))
    val n = cells.agg(sum(col("o")).as("_n"))
    rm.crossJoin(broadcast(cm))
      .join(cells, Seq("r", "c"), "left").na.fill(0L, Seq("o"))
      .crossJoin(broadcast(n))
      // margins R·C exceed int64 past ~9.2e12 (a few M rows per margin),
      // so e_ppm and BOTH squared-term factors widen to DECIMAL(38,0)
      // before multiplying — the second factor previously evaluated in
      // BIGINT and wrapped silently inside the claimed exactness regime
      .withColumn("e_ppm", expr(
        "CAST(1000000 * CAST(_rr AS DECIMAL(38,0)) * _cc DIV _n AS BIGINT)"))
      .withColumn("contrib_ppm", expr(
        """CAST(1000000 * (CAST(o AS DECIMAL(38,0)) * _n - CAST(_rr AS DECIMAL(38,0)) * _cc)
          |  * (CAST(o AS DECIMAL(38,0)) * _n - CAST(_rr AS DECIMAL(38,0)) * _cc)
          |  DIV (CAST(_n AS DECIMAL(38,0)) * _rr * _cc)
          |  AS BIGINT)""".stripMargin))
      .select(col("r"), col("c"), col("o"), col("e_ppm"), col("contrib_ppm"))
  }

  /** Two-proportion z² test on binary per-entity outcomes — the
    * conversion-rate companion of [[abTestT2]] (means) and
    * [[mannWhitneyU]] (ranks): variants by entity parity, x = converted
    * entities per arm, pooled
    *
    *   z² = (x0·n1 − x1·n0)²·(n0+n1) / (n0·n1·(x0+x1)·(n0+n1−x0−x1))
    *
    * cleared to ONE DECIMAL(38,0) floor-division (z2_ppm), direction
    * as sign(x0·n1 − x1·n0); all-converted or none-converted groups
    * (zero pooled variance) report NULL. One (group, entity) outcome
    * pass is the only data-sized stage. Output: (g, n0, n1, x0, x1,
    * rate_diff_sign, z2_ppm). */
  def abProportionsZ2(
      df: DataFrame,
      groupCol: Column,
      entityCol: Column,
      convertedCol: Column): DataFrame = {
    val per = df.select(groupCol.as("_g"), entityCol.as("_e"),
        convertedCol.cast("long").as("_x"))
      .groupBy(col("_g"), col("_e"))
      .agg(max(col("_x")).as("_c"))
      .withColumn("_v", (col("_e") % 2 === 0).cast("long"))
    val m = per.groupBy(col("_g")).agg(
      sum(col("_v")).as("n0"), sum(lit(1) - col("_v")).as("n1"),
      sum(col("_c") * col("_v")).as("x0"),
      sum(col("_c") * (lit(1) - col("_v"))).as("x1"))
    m.withColumn("_d", expr("CAST(x0 AS DECIMAL(38,0)) * n1 - CAST(x1 AS DECIMAL(38,0)) * n0"))
      .withColumn("_s", expr("CAST(x0 + x1 AS DECIMAL(38,0)) * (n0 + n1 - x0 - x1)"))
      .withColumn("z2_ppm",
        when(col("n0") > 0 && col("n1") > 0 && col("_s") > 0,
          expr("CAST(_d * _d * (n0 + n1) * 1000000 DIV (n0 * n1 * _s) AS BIGINT)")))
      .select(col("_g").as("g"), col("n0"), col("n1"), col("x0"), col("x1"),
        signum(col("_d")).cast("long").as("rate_diff_sign"), col("z2_ppm"))
  }

  /** Gini concentration coefficient per group — the inequality census
    * (how concentrated is spend/activity across entities?), computed
    * EXACTLY from the (group, value) histogram so no per-entity rank
    * window ever runs: with distinct values ascending, counts c and
    * prefix counts Cp,
    *
    *   S = Σ_v x·(2·Cp·c + c·(c+1)) − (n+1)·T,   G = S / (n·T)
    *
    * (the Σ(2r−n−1)x formula with the tie block's rank sum in closed
    * form — equal values make the block's internal order irrelevant,
    * so this IS the tie-correct Gini). gini_ppm = 10⁶·S DIV (n·T);
    * all-equal → 0, one-entity-holds-all → (n−1)/n. Values must be
    * non-negative.
    *
    * Scale shape: one map-side-combined (group, value) histogram is
    * the only data-sized pass; the prefix window and rollup run on the
    * histogram (value domain-bounded, the [[histogramDrift]] class).
    * Output: (g, n, total, gini_ppm). */
  def giniConcentration(df: DataFrame, groupCol: Column, valueCol: Column): DataFrame = {
    val hist = df.select(groupCol.as("_g"), valueCol.cast("long").as("_x"))
      .groupBy(col("_g"), col("_x")).agg(count(lit(1)).as("_c"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_x"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val pre = hist.withColumn("_cp", coalesce(sum(col("_c")).over(w), lit(0L)))
    pre.groupBy(col("_g")).agg(
        sum(col("_c")).as("n"),
        sum(col("_x") * col("_c")).as("total"),
        sum(expr("CAST(_x AS DECIMAL(38,0)) * (2 * _cp * _c + _c * (_c + 1))")).as("_s2"))
      .withColumn("gini_ppm",
        when(col("n") > 0 && col("total") > 0, expr(
          "CAST((_s2 - CAST(n + 1 AS DECIMAL(38,0)) * total) * 1000000 DIV (CAST(n AS DECIMAL(38,0)) * total) AS BIGINT)")))
      .select(col("_g").as("g"), col("n"), col("total"), col("gini_ppm"))
  }

  /** Two-sided geometric (discrete Laplace) inverse CDF for α = 1/2
    * (ε = ln 2) as cumulative ppm thresholds, k = −19..19 — COMPILE-TIME
    * literals like [[PoissonPpm]]: P(0) = 1/3, P(±k) = (1/3)·2^−k, so
    * F(k<0) = (1/3)·2^−(|k|−1), F(k≥0) = 1 − (1/3)·2^−k. The geometric
    * mechanism is the INTEGER ε-DP noise for counting queries (Ghosh-
    * Roughgarden-Sundararajan 2009) — no real-valued Laplace, no logs
    * at runtime, both engines compare a uniform ppm draw to identical
    * integers. */
  private[graft] val GeoHalfCdfPpm: Seq[(Int, Long)] = {
    val mc = new java.math.MathContext(30)
    (-19 to 19).map { k =>
      val third = BigDecimal(1, mc) / 3
      val f =
        if (k < 0) third * BigDecimal(0.5).pow(-k - 1)
        else BigDecimal(1) - third * BigDecimal(0.5).pow(k)
      k -> (f * 1000000).setScale(0, BigDecimal.RoundingMode.FLOOR).toLong
    }
  }

  /** The ladder as a shared SQL CASE over a uniform-ppm expression —
    * ONE source of truth for the Spark plan and the DuckDB oracle
    * (both embed the identical literal chain). */
  def geoNoiseCaseSql(uExpr: String): String =
    GeoHalfCdfPpm.map { case (k, thr) => s"WHEN $uExpr < $thr THEN $k" }
      .mkString("CASE ", " ", " ELSE 19 END")

  /** ε-DP count release via the geometric mechanism (ε = ln 2,
    * sensitivity 1): per key, the true count plus two-sided geometric
    * noise drawn from the key's md5-seeded uniform (deterministic
    * end-to-end — this demonstrates the RELEASE PLUMBING; a production
    * deployment swaps the seeded draw for a secret-keyed PRF, which
    * changes no plan shape). Negative releases post-process to 0 (the
    * standard non-negativity projection). Scale shape: one
    * map-side-combined count per key; the noise is a row-local CASE.
    * Output: (keys..., n_true, noise, n_noisy). */
  def dpGeometricCounts(df: DataFrame, keys: Seq[Column]): DataFrame = {
    val named = keys.zipWithIndex.map { case (c, i) => c.as(s"_k$i") }
    val kcols = keys.indices.map(i => col(s"_k$i"))
    df.select(named: _*)
      .groupBy(kcols: _*).agg(count(lit(1)).as("n_true"))
      .withColumn("_u",
        conv(substring(md5(concat_ws("|", kcols: _*)), 1, 12), 16, 10)
          .cast("long") % 1000000L)
      .withColumn("noise", expr(geoNoiseCaseSql("_u")).cast("long"))
      .withColumn("n_noisy", greatest(col("n_true") + col("noise"), lit(0L)))
      .select(kcols ++ Seq(col("n_true"), col("noise"), col("n_noisy")): _*)
  }

  /** Wald–Wolfowitz runs test per (group, entity) sequence, aggregated
    * to the group — the randomness audit for per-entity event streams
    * (a metric that alternates suspiciously or sticks in runs fails
    * it): over each entity's time-ordered binary sequence with n0
    * zeros, n1 ones, N = n0+n1 and R runs,
    *
    *   z² = ((R−1)·N − 2·n0·n1)² · (N−1) DIV (2·n0·n1·(2·n0·n1 − N))
    *
    * (the (R−μ)²/σ² square cleared of its divisions), testable when
    * n0, n1 ≥ 1 and 2n0n1 > N. Per group: sequences, testable
    * sequences, and those rejecting randomness at 5% (z² > 3.841459).
    * Scale shape: ONE entity-keyed ordered window (lag) + two
    * map-side-combined aggregations. Output: (g, n_seq, n_tested,
    * n_nonrandom). */
  def runsTest(
      df: DataFrame,
      groupCol: Column,
      entityCol: Column,
      tsCol: Column,
      tieCol: Column,
      bitCol: Column): DataFrame = {
    val w = Window.partitionBy(col("_g"), col("_e")).orderBy(col("_t"), col("_i"))
    val marked = df.select(groupCol.as("_g"), entityCol.as("_e"),
        tsCol.as("_t"), tieCol.as("_i"), bitCol.cast("long").as("_b"))
      .withColumn("_chg",
        when(lag(col("_b"), 1).over(w).isNull, 1L)
          .otherwise((col("_b") =!= lag(col("_b"), 1).over(w)).cast("long")))
    val per = marked.groupBy(col("_g"), col("_e")).agg(
      sum(col("_chg")).as("_r"),
      sum(lit(1L) - col("_b")).as("_n0"), sum(col("_b")).as("_n1"))
    val scored = per
      .withColumn("_nn", col("_n0") + col("_n1"))
      // the squared numerator reaches ~N⁴ for two-run sequences, so both
      // factors widen to DECIMAL(38,0) BEFORE the multiply (N ≲ 3000 fits
      // int64; beyond that BIGINT wraps silently with ANSI off) — same
      // exactness treatment as pairedT2/abTestT2
      .withColumn("_z2",
        when(col("_n0") >= 1 && col("_n1") >= 1 &&
          lit(2L) * col("_n0") * col("_n1") > col("_nn"), expr(
          """CAST((CAST((_r - 1) AS DECIMAL(38,0)) * _nn - 2 * _n0 * _n1)
            |  * (CAST((_r - 1) AS DECIMAL(38,0)) * _nn - 2 * _n0 * _n1)
            |  * (_nn - 1) * 1000000
            |  DIV (CAST(2 AS DECIMAL(38,0)) * _n0 * _n1 * (2 * _n0 * _n1 - _nn))
            |  AS BIGINT)""".stripMargin)))
    scored.groupBy(col("_g")).agg(
        count(lit(1)).as("n_seq"),
        sum(col("_z2").isNotNull.cast("long")).as("n_tested"),
        // when() not a raw >-cast: a NULL z² must count 0, not propagate
        sum(when(col("_z2") > 3841459L, 1L).otherwise(0L)).as("n_nonrandom"))
      .select(col("_g").as("g"), col("n_seq"), col("n_tested"), col("n_nonrandom"))
  }

  /** Paired one-sample t² on per-entity differences — the WITHIN-entity
    * experiment readout ([[abTestT2]] compares two entity populations;
    * this tests whether each entity's own pre→post change is nonzero,
    * absorbing all between-entity variance by construction):
    *
    *   t² = n·d̄²/s_d²  =  (Σd)²·(n−1) / (n·Σd² − (Σd)²)
    *
    * cleared to ONE DECIMAL(38,0) floor-division (t2_ppm), direction as
    * sign(Σd); zero-variance differences → NULL. One (group, entity)
    * difference pass is the only data-sized stage. Output:
    * (g, n, sum_d, dir_sign, t2_ppm). */
  def pairedT2(
      df: DataFrame,
      groupCol: Column,
      entityCol: Column,
      diffCol: Column): DataFrame = {
    val per = df.select(groupCol.as("_g"), entityCol.as("_e"),
        diffCol.cast("long").as("_d"))
      .groupBy(col("_g"), col("_e"))
      .agg(sum(col("_d")).as("_dd"))
    val m = per.groupBy(col("_g")).agg(
      count(lit(1)).cast("long").as("n"),
      sum(col("_dd")).as("sum_d"),
      sum(expr("CAST(_dd AS DECIMAL(38,0)) * _dd")).as("_q"))
    m.withColumn("_den", expr("n * _q - CAST(sum_d AS DECIMAL(38,0)) * sum_d"))
      .withColumn("t2_ppm",
        when(col("n") > 1 && col("_den") > 0, expr(
          "CAST(CAST(sum_d AS DECIMAL(38,0)) * sum_d * (n - 1) * 1000000 DIV _den AS BIGINT)")))
      .select(col("_g").as("g"), col("n"), col("sum_d"),
        signum(col("sum_d")).cast("long").as("dir_sign"), col("t2_ppm"))
  }

  /** Kruskal–Wallis H — the k-arm NONPARAMETRIC omnibus ([[anovaF]]'s
    * rank sibling, generalizing [[mannWhitneyU]] past two variants):
    * are the k per-entity metric distributions distinguishable at all,
    * robustly to whales? Uses the tie-exact general form
    *
    *   H = (N−1)·Σ_g (D_g − n_g(N+1))²/n_g / (Σ d² − N(N+1)²)
    *
    * over DOUBLED tie-averaged ranks d = 2·below + eq + 1 (integers even
    * at half-rank ties; the denominator is the total rank variance, so
    * the tie correction Σ(t³−t) is absorbed exactly — no separate tie
    * census). Balance (equal n_g, from the caller's dense grid — the
    * [[anovaF]] convention) clears H to ONE DECIMAL(38,0)
    * floor-division; unbalanced designs and all-tied inputs report NULL.
    *
    * NO UNPARTITIONED WINDOW for the pooled ranks: the global
    * below-count comes from the value-banded two-pass prefix sum (the
    * Maintenance.balancedWriteSplit shape) — per-band tie-census totals
    * (≤ nBands rows, a bounded driver stat) broadcast as offsets, then
    * an in-band cumsum window PARTITIONED by band. The ranks frame is
    * the DISTINCT-VALUE census, not the entity frame, so the windows
    * see ~|distinct values| rows.
    *
    * Scale shape: one (arm, entity) totals aggregation (the data-sized
    * pass), one value census, banded prefix on the census, one
    * (arm, value) census join, a k-row rollup. Output: one row
    * (k, n, nn, h_ppm). */
  def kruskalWallisH(
      df: DataFrame,
      armCol: Column,
      entityCol: Column,
      valueCol: Column,
      nBands: Int = 64): DataFrame = {
    require(nBands > 0, s"nBands must be positive: $nBands")
    val spark = df.sparkSession
    import spark.implicits._
    val per = df.select(armCol.as("_g"), entityCol.as("_e"), valueCol.as("_x"))
      .groupBy(col("_g"), col("_e"))
      .agg(sum(col("_x")).as("_t"))
    val census = per.groupBy(col("_t")).agg(count(lit(1)).as("_eq"))
    val rng = census.agg(min(col("_t")).as("_lo"), max(col("_t")).as("_hi"))
    val banded = census.crossJoin(broadcast(rng))
      .withColumn("_band", graft.functions.Banding.bandExpr("_t", nBands))
    val bandTotals = banded.groupBy(col("_band")).agg(sum(col("_eq")).as("_bb"))
      .as[(Int, Long)].collect().sortBy(_._1) // ≤ nBands rows by construction
    val offDf = bandTotals.map(_._1)
      .zip(bandTotals.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
      .toSeq.toDF("_band", "_off")
    val w = Window.partitionBy(col("_band")).orderBy(col("_t"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranks = banded.join(broadcast(offDf), Seq("_band"))
      .withColumn("_below", col("_off") + sum(col("_eq")).over(w) - col("_eq"))
      .withColumn("_d2", col("_below") * 2 + col("_eq") + 1)
      .select(col("_t"), col("_eq"), col("_d2"))
    val armCensus = per.groupBy(col("_g"), col("_t")).agg(count(lit(1)).as("_c"))
    val arms = armCensus.join(ranks, Seq("_t"))
      .groupBy(col("_g"))
      .agg(sum(col("_c")).as("_ng"),
        sum(expr("CAST(_c AS DECIMAL(38,0)) * _d2")).as("_dg"))
    val sd2 = ranks
      .agg(sum(expr("CAST(_eq AS DECIMAL(38,0)) * _d2 * _d2")).as("_sd2"))
    val tot = arms.agg(sum(col("_ng")).as("_nnAll")) // 1 row — a literal
    // partitionBy(lit) would constant-fold to an UNPARTITIONED window
    arms.crossJoin(broadcast(sd2)).crossJoin(broadcast(tot))
      .withColumn("_a", expr("_dg - CAST(_ng AS DECIMAL(38,0)) * (_nnAll + 1)"))
      .agg(count(lit(1)).cast("long").as("k"),
        max(col("_ng")).cast("long").as("n"),
        min(col("_ng")).cast("long").as("_nmin"),
        max(col("_nnAll")).cast("long").as("nn"),
        sum(expr("_a * _a")).as("_sa2"),
        max(col("_sd2")).as("_sd2"))
      .withColumn("_tot", expr(
        "_sd2 - CAST(nn AS DECIMAL(38,0)) * (nn + 1) * (nn + 1)"))
      .withColumn("h_ppm",
        when(col("n") === col("_nmin") && col("k") > 1 && col("_tot") > 0,
          expr("CAST((nn - 1) * _sa2 * 1000000 DIV (n * _tot) AS BIGINT)")))
      .select(col("k"), col("n"), col("nn"), col("h_ppm"))
  }

  /** Welch's unequal-variance t² per metric group — [[abTestT2]] without
    * the pooled-variance assumption (the robust default when one arm is
    * noisier, e.g. a treatment that widens the spend distribution).
    * Variants by entity parity, the registry convention. Per-arm
    * variance-of-the-mean is quantized to ppm FIRST (the [[cupedDelta]]
    * θ_ppm convention — quantize once, then both engines replay the
    * identical integer recurrence):
    *
    *   v_g_ppm  = ⌊10⁶·(n_g·Q_g − S_g²) / (n_g²·(n_g−1))⌋
    *   Δ_ppm    = ⌊10⁶·(S₀n₁ − S₁n₀) / (n₀n₁)⌋      (truncating DIV,
    *              Spark DIV ≡ DuckDB // toward zero on negatives)
    *   t2w_ppm  = ⌊Δ_ppm² / (v₀_ppm + v₁_ppm)⌋
    *
    * Each division is one DECIMAL(38,0) floor; the composition
    * under-states the true 10⁶·Δ²/(v₀+v₁) by < 1 ppm of itself at any
    * real n (quantization enters at 10⁻⁶ relative). Arms with n < 2 or
    * sub-ppm total variance-of-mean report NULL — "no measurable noise"
    * is a degenerate test, not t² = ∞.
    *
    * Scale shape: one (group, entity) totals aggregation, one
    * (group, variant) moment rollup, a row-local formula. Output:
    * (g, n0, n1, delta_ppm, v0_ppm, v1_ppm, t2w_ppm). */
  def welchT2(
      df: DataFrame,
      groupCol: Column,
      entityCol: Column,
      valueCol: Column): DataFrame = {
    val per = df.select(groupCol.as("_g"), entityCol.as("_e"), valueCol.as("_x"))
      .groupBy(col("_g"), col("_e"))
      .agg(sum(col("_x")).as("_t"))
      .withColumn("_v", (col("_e") % 2 === 0).cast("int"))
    val m = per.groupBy(col("_g"))
      .agg(
        sum(col("_v")).cast("long").as("n0"),
        sum(lit(1) - col("_v")).cast("long").as("n1"),
        sum(col("_t") * col("_v")).as("_s0"),
        sum(col("_t") * (lit(1) - col("_v"))).as("_s1"),
        sum(expr("CAST(_t AS DECIMAL(38,0)) * _t * _v")).as("_q0"),
        sum(expr("CAST(_t AS DECIMAL(38,0)) * _t * (1 - _v)")).as("_q1"))
    m.withColumn("delta_ppm", when(col("n0") > 0 && col("n1") > 0, expr(
        """CAST((CAST(_s0 AS DECIMAL(38,0)) * n1 - CAST(_s1 AS DECIMAL(38,0)) * n0)
          |  * 1000000 DIV (CAST(n0 AS DECIMAL(38,0)) * n1) AS BIGINT)""".stripMargin)))
      .withColumn("v0_ppm", when(col("n0") > 1, expr(
        """CAST((n0 * _q0 - CAST(_s0 AS DECIMAL(38,0)) * _s0) * 1000000
          |  DIV (CAST(n0 AS DECIMAL(38,0)) * n0 * (n0 - 1)) AS BIGINT)""".stripMargin)))
      .withColumn("v1_ppm", when(col("n1") > 1, expr(
        """CAST((n1 * _q1 - CAST(_s1 AS DECIMAL(38,0)) * _s1) * 1000000
          |  DIV (CAST(n1 AS DECIMAL(38,0)) * n1 * (n1 - 1)) AS BIGINT)""".stripMargin)))
      .withColumn("t2w_ppm",
        when(col("v0_ppm").isNotNull && col("v1_ppm").isNotNull &&
            col("v0_ppm") + col("v1_ppm") > 0,
          expr("""CAST(CAST(delta_ppm AS DECIMAL(38,0)) * delta_ppm
                 |  DIV (v0_ppm + v1_ppm) AS BIGINT)""".stripMargin)))
      .select(col("_g").as("g"), col("n0"), col("n1"), col("delta_ppm"),
        col("v0_ppm"), col("v1_ppm"), col("t2w_ppm"))
  }

  /** Nearest-neighbor matched-pairs estimator (covariate matching with
    * replacement — the observational-causal workhorse when assignment
    * was not randomized): every treated entity is matched to the
    * control entity with the CLOSEST covariate value, and the average
    * treated−matched-control outcome difference estimates the ATT.
    * Deterministic contract: one control REPRESENTATIVE per
    * (group, covariate value) — the control with the smallest id —
    * equidistant prev/next ties resolve to the SMALLER covariate, and
    * att_mils is a truncating DIV (Spark DIV ≡ DuckDB // toward zero,
    * the [[cupedDelta]] negative-quotient note).
    *
    * NO per-group funnel: nearest-by-value needs an ordered pass, but a
    * window partitioned only by group would drag every entity of a
    * group through one task. Instead the covariate axis is BANDED (the
    * [[kruskalWallisH]] / balancedWriteSplit shape): in-band prev/next
    * windows run partitioned by (group, band), and the cross-band
    * fallback (nearest control in any lower/higher band) comes from the
    * band-summary frame — ≤ groups×nBands rows, domain-bounded — via
    * windows on that tiny frame. Exact: a band-local neighbor always
    * dominates the fallback on its side, and both sides are compared.
    *
    * Output: (g, n_treated, n_matched, sum_dy, att_mils, sum_adx) —
    * sum_adx (total matched covariate distance) is the balance audit:
    * a large value means the matches are stretching. */
  def nnMatchAtt(
      df: DataFrame,
      groupCol: Column,
      treatCol: Column,
      idCol: Column,
      xCol: Column,
      yCol: Column,
      nBands: Int = 64): DataFrame = {
    require(nBands > 0, s"nBands must be positive: $nBands")
    val base = df.select(groupCol.as("_g"), treatCol.cast("boolean").as("_tr"),
      idCol.cast("long").as("_id"), xCol.cast("long").as("_x"),
      yCol.cast("long").as("_y"))
    val reps = base.filter(!col("_tr"))
      .groupBy(col("_g"), col("_x"))
      .agg(min(struct(col("_id"), col("_y"))).as("_c"))
      .select(col("_g"), col("_x"),
        col("_c._id").as("_cid"), col("_c._y").as("_cy"))
    val rng = base.agg(min(col("_x")).as("_lo"), max(col("_x")).as("_hi"))
    def withBand(d: DataFrame): DataFrame = d.crossJoin(broadcast(rng))
      .withColumn("_band", graft.functions.Banding.bandExpr("_x", nBands))
      .drop("_lo", "_hi")
    val nulL = lit(null).cast("long")
    val cRows = withBand(reps).select(col("_g"), col("_band"), col("_x"),
      lit(1).as("_isC"), col("_cid"), col("_cy"), nulL.as("_id"), nulL.as("_y"))
    val tRows = withBand(base.filter(col("_tr"))).select(col("_g"), col("_band"),
      col("_x"), lit(0).as("_isC"), nulL.as("_cid"), nulL.as("_cy"),
      col("_id"), col("_y"))
    val u = cRows.unionByName(tRows)
    // cross-band fallbacks over the band-summary frame (tiny)
    val summary = withBand(reps).groupBy(col("_g"), col("_band"))
      .agg(min(struct(col("_x"), col("_cid"), col("_cy"))).as("_first"),
        max(struct(col("_x"), col("_cid"), col("_cy"))).as("_last"))
    val bands = u.select(col("_g"), col("_band")).distinct()
      .join(summary, Seq("_g", "_band"), "left")
    val wLo = Window.partitionBy(col("_g")).orderBy(col("_band"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val wHi = Window.partitionBy(col("_g")).orderBy(col("_band"))
      .rowsBetween(1, Window.unboundedFollowing)
    val fb = bands
      .withColumn("_pf", last(col("_last"), ignoreNulls = true).over(wLo))
      .withColumn("_nf", first(col("_first"), ignoreNulls = true).over(wHi))
      .select(col("_g"), col("_band"), col("_pf"), col("_nf"))
    // in-band prev/next: controls sort BEFORE treated at equal x, so an
    // exact-covariate control lands in prev with distance 0
    val ord = Seq(col("_x").asc, col("_isC").desc)
    val wPrev = Window.partitionBy(col("_g"), col("_band")).orderBy(ord: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wNext = Window.partitionBy(col("_g"), col("_band")).orderBy(ord: _*)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val cStruct = when(col("_isC") === 1,
      struct(col("_x"), col("_cid"), col("_cy")))
    val marked = u
      .withColumn("_pc", last(cStruct, ignoreNulls = true).over(wPrev))
      .withColumn("_nc", first(cStruct, ignoreNulls = true).over(wNext))
    val t = marked.filter(col("_isC") === 0)
      .join(broadcast(fb), Seq("_g", "_band"), "left")
      .withColumn("_p", coalesce(col("_pc"), col("_pf")))
      .withColumn("_n2", coalesce(col("_nc"), col("_nf")))
      .withColumn("_usePrev", col("_p").isNotNull &&
        (col("_n2").isNull || col("_x") - col("_p._x") <= col("_n2._x") - col("_x")))
      .withColumn("_m", when(col("_usePrev"), col("_p")).otherwise(col("_n2")))
    t.groupBy(col("_g"))
      .agg(count(lit(1)).as("n_treated"),
        count(col("_m")).as("n_matched"),
        sum(when(col("_m").isNotNull, col("_y") - col("_m._cy"))).as("sum_dy"),
        sum(when(col("_m").isNotNull, abs(col("_x") - col("_m._x")))).as("sum_adx"))
      .withColumn("att_mils",
        when(col("n_matched") > 0, expr("sum_dy DIV n_matched")))
      .select(col("_g").as("g"), col("n_treated"), col("n_matched"),
        col("sum_dy"), col("att_mils"), col("sum_adx"))
  }

  /** Kendall tau-b rank correlation over a DOMAIN-BOUNDED point series
    * per group (≤ a few hundred points — e.g. a daily rollup; the
    * O(n²) pair frame is the textbook tau definition and stays tiny
    * because the series, not the corpus, bounds it). Tie-corrected:
    *
    *   tau_b² = (C − D)² / ((n₀ − n₁)(n₀ − n₂))
    *
    * with n₀ = n(n−1)/2 and n₁/n₂ the tied-pair counts in x/y; shipped
    * as dir_sign = sign(C − D) plus one ppm floor-division ([[spearmanRho]]
    * convention — corpus-scale rank correlation belongs there; this is
    * the small-series, heavy-tie companion where tau's pair semantics
    * are wanted). Output: (g, n_pts, conc, disc, dir_sign, tau2_ppm). */
  def kendallTauB(pts: DataFrame): DataFrame = {
    val a = pts.select(col("g"), col("i").as("_ia"),
      col("x").as("_xa"), col("y").as("_ya"))
    val b = pts.select(col("g"), col("i").as("_ib"),
      col("x").as("_xb"), col("y").as("_yb"))
    val pairs = a.hint("shuffle_hash").join(b, Seq("g"))
      .filter(col("_ia") < col("_ib"))
      .withColumn("_sx", signum(col("_xb") - col("_xa")).cast("long"))
      .withColumn("_sy", signum(col("_yb") - col("_ya")).cast("long"))
    val agg = pairs.groupBy(col("g")).agg(
      count(lit(1)).as("_n0"),
      sum(when(col("_sx") * col("_sy") === 1, 1L).otherwise(0L)).as("conc"),
      sum(when(col("_sx") * col("_sy") === -1, 1L).otherwise(0L)).as("disc"),
      sum(when(col("_sx") === 0, 1L).otherwise(0L)).as("_n1"),
      sum(when(col("_sy") === 0, 1L).otherwise(0L)).as("_n2"))
    val n = pts.groupBy(col("g")).agg(count(lit(1)).as("n_pts"))
    n.join(agg, Seq("g"))
      .withColumn("_cd", col("conc") - col("disc"))
      .withColumn("_den", expr(
        "CAST(_n0 - _n1 AS DECIMAL(38,0)) * (_n0 - _n2)"))
      .withColumn("tau2_ppm",
        when(col("_den") > 0, expr(
          "CAST(CAST(_cd AS DECIMAL(38,0)) * _cd * 1000000 DIV _den AS BIGINT)")))
      .select(col("g"), col("n_pts"), col("conc"), col("disc"),
        signum(col("_cd")).cast("long").as("dir_sign"), col("tau2_ppm"))
  }

  /** Gini–Simpson behavioral diversity per entity: 1 − Σ_t p_t² over the
    * entity's category mix — the probability two of its events drawn at
    * random differ in category (0 = monomaniac, → 1 = uniform spread).
    * Chosen over Shannon entropy because it is PURELY RATIONAL:
    * div_ppm = ⌊10⁶·(C² − Σc²)/C²⌋ needs no logarithm, so the integer
    * arithmetic replays exactly in any engine ([[exactQuantilesSelect]]'s
    * FP-free rationale). The segmentation signal behind "diverse vs
    * single-purpose users" cohorting.
    *
    * Scale shape: one (entity, category) count aggregation
    * (map-side-combined), one per-entity rollup — both shuffles narrow,
    * keyed on the entity. Output: (e, n_events, n_cats, div_ppm). */
  def simpsonDiversity(
      df: DataFrame,
      entityCol: Column,
      catCol: Column): DataFrame = {
    val counts = df.select(entityCol.as("_e"), catCol.as("_c"))
      .groupBy(col("_e"), col("_c"))
      .agg(count(lit(1)).as("_n"))
    counts.groupBy(col("_e"))
      .agg(sum(col("_n")).as("n_events"),
        count(lit(1)).as("n_cats"),
        sum(expr("CAST(_n AS DECIMAL(38,0)) * _n")).as("_s2"))
      .withColumn("div_ppm", expr(
        """CAST((CAST(n_events AS DECIMAL(38,0)) * n_events - _s2) * 1000000
          |  DIV (CAST(n_events AS DECIMAL(38,0)) * n_events) AS BIGINT)""".stripMargin))
      .select(col("_e").as("e"), col("n_events"), col("n_cats"), col("div_ppm"))
  }

  /** Exact ROC-AUC per group of a score against a binary label — the
    * probability-of-correct-ranking form AUC = P(s⁺ > s⁻) + ½P(s⁺ = s⁻),
    * i.e. the [[mannWhitneyU]] statistic normalized by n⁺·n⁻ — computed
    * WITHOUT ranking the rows: a (group, score) value census carries
    * (n_pos, n_neg) per distinct score, a prefix sum of negatives over
    * the census (window partitioned by group — never a global sort)
    * gives each positive its doubled beaten-pair count
    * 2·(neg strictly below) + (neg tied), and one rollup per group sums
    * them. Everything row-count-sized happens in the ONE map-side-
    * combined census aggregation; the window runs over the
    * score-DOMAIN-bounded census frame only ([[exactQuantilesSelect]]'s
    * shape). u2 = 2·U and auc_ppm = ⌊10⁶·u2 / (2·n⁺·n⁻)⌋ are exact
    * integers end to end (sums in DECIMAL(38,0) — exact to ~10⁹ rows per
    * side per group; past that stratify, AUC averages over strata).
    * Single-class groups report NULL. Output: (g, n_pos, n_neg, u2,
    * auc_ppm). */
  def aucByGroup(
      df: DataFrame,
      groupCol: Column,
      scoreCol: Column,
      posCol: Column): DataFrame = {
    val census = df
      .select(groupCol.as("_g"), scoreCol.as("_s"), posCol.cast("long").as("_p"))
      .groupBy(col("_g"), col("_s"))
      .agg(sum(col("_p")).as("_np"), sum(lit(1L) - col("_p")).as("_nn"))
    val w = Window.partitionBy(col("_g")).orderBy(col("_s"))
    val pref = census.withColumn("_cumn", sum(col("_nn")).over(w))
    pref.groupBy(col("_g"))
      .agg(sum(col("_np")).as("n_pos"), sum(col("_nn")).as("n_neg"),
        sum(expr("CAST(_np AS DECIMAL(38,0)) * (2 * (_cumn - _nn) + _nn)"))
          .as("_u2"))
      .withColumn("auc_ppm",
        when(col("n_pos") > 0 && col("n_neg") > 0, expr(
          """CAST(_u2 * 1000000
            |  DIV (2 * CAST(n_pos AS DECIMAL(38,0)) * n_neg) AS BIGINT)""".stripMargin)))
      .select(col("_g").as("g"), col("n_pos"), col("n_neg"),
        col("_u2").cast("long").as("u2"), col("auc_ppm"))
  }

  /** Exact per-group precision-recall curve — the threshold-sweep
    * companion of [[aucByGroup]] (AUC summarizes rank order; the PR
    * curve shows WHERE the ranker is usable, the question a curation
    * team asks before picking a quality-score cutoff): one point per
    * distinct score bucket, scanning thresholds from the highest bucket
    * down. Census-first like AUC: the row-sized work is ONE
    * (group, bucket) count agg; the cumulative window runs over the
    * domain-bounded census only. Output: (g, bucket, tp, fp, fn,
    * precision_ppm, recall_ppm, f1_ppm). */
  def prCurveByGroup(
      df: DataFrame,
      groupCol: Column,
      bucketCol: Column,
      posCol: Column): DataFrame = {
    val census = df
      .select(groupCol.as("g"), bucketCol.as("bucket"),
        posCol.cast("long").as("_p"))
      .groupBy(col("g"), col("bucket"))
      .agg(sum(col("_p")).as("_np"), sum(lit(1L) - col("_p")).as("_nn"))
    val w = Window.partitionBy(col("g")).orderBy(col("bucket").desc)
    val wAll = Window.partitionBy(col("g"))
    census
      .withColumn("tp", sum(col("_np")).over(w))
      .withColumn("fp", sum(col("_nn")).over(w))
      .withColumn("fn", sum(col("_np")).over(wAll) - col("tp"))
      .withColumn("precision_ppm",
        expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 DIV (tp + fp) AS BIGINT)"))
      .withColumn("recall_ppm",
        when(col("tp") + col("fn") > 0L,
          expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 DIV (tp + fn) AS BIGINT)")))
      .withColumn("f1_ppm",
        when(expr("2 * tp + fp + fn") > 0L,
          expr("CAST(2 * CAST(tp AS DECIMAL(38,0)) * 1000000 DIV (2 * tp + fp + fn) AS BIGINT)")))
      .select(col("g"), col("bucket"), col("tp"), col("fp"), col("fn"),
        col("precision_ppm"), col("recall_ppm"), col("f1_ppm"))
  }

  /** Average precision per group — the single-number PR-curve summary
    * (the retrieval-eval twin of AUC under class imbalance): AP =
    * Σ_buckets Δtp · precision / P over the SAME score-bucket census as
    * [[prCurveByGroup]], evaluated highest-bucket-first — Δtp at a
    * bucket is its positive count, precision is the floored ppm at that
    * threshold, and the final division floors last, so the number
    * replays exactly cross-engine. Output: (g, n_pos, ap_ppm). */
  def avgPrecisionByGroup(
      df: DataFrame,
      groupCol: Column,
      bucketCol: Column,
      posCol: Column): DataFrame = {
    val census = df
      .select(groupCol.as("g"), bucketCol.as("bucket"),
        posCol.cast("long").as("_p"))
      .groupBy(col("g"), col("bucket"))
      .agg(sum(col("_p")).as("_np"), sum(lit(1L) - col("_p")).as("_nn"))
    val w = Window.partitionBy(col("g")).orderBy(col("bucket").desc)
    census
      .withColumn("tp", sum(col("_np")).over(w))
      .withColumn("fp", sum(col("_nn")).over(w))
      .withColumn("_prec",
        expr("CAST(CAST(tp AS DECIMAL(38,0)) * 1000000 DIV (tp + fp) AS BIGINT)"))
      .groupBy(col("g"))
      .agg(sum(col("_np")).as("n_pos"),
        sum(expr("CAST(_np AS DECIMAL(38,0)) * _prec")).as("_ap_num"))
      .withColumn("ap_ppm",
        when(col("n_pos") > 0L, expr("CAST(_ap_num DIV n_pos AS BIGINT)")))
      .select(col("g"), col("n_pos"), col("ap_ppm"))
  }

  /** Brier-score decomposition — the probabilistic-forecast quality
    * census (reliability / resolution / uncertainty; Murphy 1973): how
    * well do claimed probabilities match observed outcome rates, and
    * how much of the error is miscalibration vs inherent noise? All
    * integer: probabilities arrive as milli-units (0..1000), every
    * division is a floor division in a defined order, so the ppm
    * outputs replay exactly cross-engine. Cost: one row-sized agg for
    * the Brier sum + one `bins`-row calibration census. Output one row:
    * (n, brier_ppm, rel_ppm, res_ppm, unc_ppm). */
  def brierDecomposition(
      df: DataFrame,
      probMilliCol: Column,
      posCol: Column,
      bins: Int = 10): DataFrame =
    brierFromCensus(brierCensus(df, probMilliCol, posCol, bins))

  /** The per-bin calibration census [[brierDecomposition]] reduces:
    * (_bin, _n, _sp, _so, _se) — pure SUMS, so shards/micro-batches
    * merge by addition and the decomposition read from a maintained
    * view equals the batch one (the q_stream_brier contract). */
  def brierCensus(
      df: DataFrame,
      probMilliCol: Column,
      posCol: Column,
      bins: Int = 10): DataFrame = {
    require(bins >= 1 && 1000 % bins == 0, s"bins must divide 1000: $bins")
    df.select(probMilliCol.cast("long").as("_p"),
        posCol.cast("long").as("_o"))
      .withColumn("_bin", expr(s"_p DIV ${1000 / bins}"))
      .groupBy(col("_bin"))
      .agg(count(lit(1)).as("_n"), sum(col("_p")).as("_sp"),
        sum(col("_o")).as("_so"),
        sum(expr("CAST((_p - 1000 * _o) AS DECIMAL(38,0)) * (_p - 1000 * _o)")).as("_se"))
  }

  /** Decomposition readout over a [[brierCensus]] frame. */
  def brierFromCensus(census: DataFrame): DataFrame = {
    val perBin = census.withColumn("_om", expr("1000 * _so DIV _n"))
    // 1-row global (count, Brier sum, reliability sum, base rate) joined
    // back by broadcast — the bins-row census never leaves the executors
    val glob = perBin
      .agg(sum(col("_n")).as("n"), sum(col("_se")).as("_sum_e"),
        sum(expr("""(CAST(_sp AS DECIMAL(38,0)) - 1000 * _so)
                   | * (CAST(_sp AS DECIMAL(38,0)) - 1000 * _so) DIV _n""".stripMargin))
          .as("_rel"),
        sum(col("_so")).as("_sot"))
      .withColumn("_omg", expr("1000 * _sot DIV n"))
    perBin.crossJoin(broadcast(glob))
      .groupBy(col("n"), col("_sum_e"), col("_rel"), col("_omg"))
      .agg(sum(expr("CAST(_n AS DECIMAL(38,0)) * (_om - _omg) * (_om - _omg)")).as("_res"))
      .select(col("n"),
        expr("CAST(_sum_e DIV n AS BIGINT)").as("brier_ppm"),
        expr("CAST(_rel DIV n AS BIGINT)").as("rel_ppm"),
        expr("CAST(_res DIV n AS BIGINT)").as("res_ppm"),
        expr("CAST(_omg * (1000 - _omg) AS BIGINT)").as("unc_ppm"))
  }

  /** Split-conformal calibration + marginal-coverage audit (Vovk et al.;
    * Papadopoulos et al. 2002; Lei et al. 2018) — the distribution-free
    * uncertainty wrapper a production scorer ships with: hold out a
    * calibration split, compute nonconformity scores s_i against a point
    * predictor, and the threshold qhat = the ⌈(n+1)(1−α)⌉-th smallest
    * calibration score guarantees P(s <= qhat) >= 1-alpha on exchangeable eval
    * data — for ANY predictor and ANY score function. This runs the
    * whole loop per group and AUDITS the guarantee on the eval split.
    *
    * Deterministic, engine-exact: calibration membership is the md5
    * nibble of the row id (< 8 ⇒ calibration — the [[Sampling]] split
    * contract), the predictor is the exact nearest-rank calibration
    * MEDIAN, the score is |v − median| (integer mils), and qhat is the
    * exact finite-sample conformal rank min(n, ⌈(n+1)(100−α)/100⌉) —
    * the +1 is what makes the guarantee hold at finite n.
    *
    * Scale shape: two grouped 2-pass selections (the
    * [[groupedExactQuantiles]] pattern — domain-bounded histograms to
    * the driver, boundary-bin rescans; never a per-group rank window
    * that would funnel each group through one task) + broadcast joins
    * of the O(groups) median/threshold frames + one coverage agg.
    * Output: (g, n_cal, n_eval, med_mils, qhat_mils, n_covered,
    * coverage_ppm). */
  def conformalCoverage(
      df: DataFrame,
      groupCol: Column,
      idCol: Column,
      valueMils: Column,
      alphaPct: Int = 10,
      binWidth: Long = 10000L,
      maxHistRows: Int = 1 << 20): DataFrame = {
    require(alphaPct >= 1 && alphaPct <= 99, s"alphaPct must be in 1..99: $alphaPct")
    val spark = df.sparkSession
    import spark.implicits._
    val base = df.select(groupCol.cast("string").as("_g"),
      valueMils.cast("long").as("_v"),
      (Sampling.hashNibble(idCol) < 8).as("_cal"))
    val med = groupedExactQuantiles(base.filter(col("_cal")), col("_g"), "_v",
        Seq(50), binWidth, maxHistRows)
      .select(col("g").as("_g"), col("n").as("n_cal"), col("_v").as("med_mils"))
    val scored = base.join(broadcast(med), Seq("_g"))
      .withColumn("_s", abs(col("_v") - col("med_mils")))
    val sv = scored.filter(col("_cal"))
      .select(col("_g"), col("_s").as("_v"))
      .withColumn("_bin", expr(s"_v DIV $binWidth"))
    val histRows = sv.groupBy(col("_g"), col("_bin")).agg(count(lit(1)).as("_c"))
      .limit(maxHistRows + 1)
      .as[(String, Long, Long)].collect()
    require(histRows.length <= maxHistRows,
      s"conformalCoverage: (groups x bins) histogram exceeds $maxHistRows — raise binWidth")
    val targets = histRows.groupBy(_._1).toSeq.map { case (g, rows) =>
      val bins = rows.map(r => (r._2, r._3)).sortBy(_._1)
      val n = bins.map(_._2).sum
      val rank = math.min(n, ((n + 1) * (100L - alphaPct) + 99) / 100)
      var cum = 0L; var i = 0
      while (cum + bins(i)._2 < rank) { cum += bins(i)._2; i += 1 }
      (g, bins(i)._1, rank - cum)
    }
    val tdf = targets.toDF("_g", "_bin", "_off")
    val wBin = Window.partitionBy(col("_g"), col("_bin")).orderBy(col("_v"))
    val qhat = sv
      .join(broadcast(tdf.select(col("_g"), col("_bin")).distinct()), Seq("_g", "_bin"))
      .withColumn("_r", row_number().over(wBin))
      .join(broadcast(tdf), Seq("_g", "_bin"))
      .filter(col("_r") === col("_off"))
      .select(col("_g"), col("_v").as("qhat_mils"))
    scored.filter(!col("_cal"))
      .join(broadcast(qhat), Seq("_g"))
      .groupBy(col("_g"), col("med_mils"), col("qhat_mils"))
      .agg(count(lit(1)).as("n_eval"),
        sum((col("_s") <= col("qhat_mils")).cast("long")).as("n_covered"))
      .join(broadcast(med.select(col("_g"), col("n_cal"))), Seq("_g"))
      .select(col("_g").as("g"), col("n_cal"), col("n_eval"),
        col("med_mils"), col("qhat_mils"), col("n_covered"),
        expr("CAST(n_covered * 1000000 DIV n_eval AS BIGINT)").as("coverage_ppm"))
  }

  /** k-anonymity / l-diversity release audit (Sweeney 2002;
    * Machanavajjhala et al. 2007) — the re-identification check a
    * training-data release runs after PII scrubbing: group the release
    * by its quasi-identifier combination and measure how identifying
    * each equivalence class is. A class seen for fewer than k distinct
    * entities re-identifies them by linkage; a class whose sensitive
    * attribute takes fewer than l values leaks it even at k-anonymity
    * (the homogeneity attack l-diversity exists for).
    *
    * Output: the `topK` weakest classes (fewest distinct entities,
    * then the class key) with the release-wide census repeated on each
    * row — k_entity_min IS the k-anonymity of the release, l_min its
    * l-diversity; n_viol_classes / n_exposed_rows / n_low_l_classes
    * size the suppression work a k/l-safe release needs.
    *
    * Scale shape: ONE map-side-combinable groupBy over the QI columns
    * (two count_distincts share the scan via Expand), a 1-row census
    * over the O(classes) frame broadcast back, and TakeOrderedAndProject
    * for the weakest-class list. Rows never shuffle twice; the class
    * frame is bounded by the QI domain, not the data. */
  def kAnonymityCensus(
      df: DataFrame,
      quasiIds: Seq[(String, Column)],
      entity: Column,
      sensitive: Column,
      k: Long,
      l: Long,
      topK: Int = 20): DataFrame = {
    require(quasiIds.nonEmpty && k >= 1 && l >= 1 && topK >= 1,
      s"bad audit params (qi=${quasiIds.size}, k=$k, l=$l, topK=$topK)")
    val base = df.select(
      quasiIds.map { case (n, c) => c.as(n) } ++
        Seq(entity.as("_e"), sensitive.as("_s")): _*)
    val classes = base
      .groupBy(quasiIds.map { case (n, _) => col(n) }: _*)
      .agg(count(lit(1)).as("n_rows"),
        count_distinct(col("_e")).as("n_entities"),
        count_distinct(col("_s")).as("n_sensitive"))
    val census = classes.agg(
      count(lit(1)).as("n_classes"),
      sum(col("n_rows")).as("total_rows"),
      min(col("n_entities")).as("k_entity_min"),
      min(col("n_rows")).as("k_row_min"),
      min(col("n_sensitive")).as("l_min"),
      sum(when(col("n_entities") < k, 1L).otherwise(0L)).as("n_viol_classes"),
      sum(when(col("n_entities") < k, col("n_rows")).otherwise(0L)).as("n_exposed_rows"),
      sum(when(col("n_sensitive") < l, 1L).otherwise(0L)).as("n_low_l_classes"))
    // The trailing orderBy is a CONTRACT, not a cosmetic (ADVICE r12):
    // orderBy().limit() above picks the topK set, but row ORDER surviving
    // the crossJoin is a BroadcastNestedLoopJoin implementation detail —
    // the oracle is ORDER BY'd, so the output order must be declared on
    // the final frame, after the join.
    classes
      .orderBy(col("n_entities") +: col("n_rows") +:
        quasiIds.map { case (n, _) => col(n) }: _*)
      .limit(topK)
      .crossJoin(broadcast(census))
      .orderBy(col("n_entities") +: col("n_rows") +:
        quasiIds.map { case (n, _) => col(n) }: _*)
  }
}
