package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequential per-entity time-series folds that a window frame cannot
  * express: an EWMA with floor-rounding is a recurrence (each state
  * depends on the rounded previous state), so it cannot be rewritten as
  * a closed-form weighted window sum — it has to be FOLDED in order.
  *
  * Spark shape: one shuffle groups each entity's rows, `sort_array`
  * orders them row-locally, and `aggregate` (the Catalyst fold HOF) runs
  * the recurrence inside the executor — the exact shape of the greedy
  * packer in [[Chunking]]. Entities are independent, so 100 TB of
  * telemetry folds as width, not depth; a single entity's history must
  * fit a task (same bound as any per-key collect, and the honest
  * contract of an ordered recurrence).
  *
  * Exact-integer determinism: values are folded as mils
  * (floor(value·1000)); the EWMA update is
  * e′ = floor(((den−1)·e + v)/den) over non-negative ints, replayed
  * verbatim by a recursive-CTE oracle.
  */
object TimeSeries {

  /** Per-key EWMA (α = 1/den) + threshold anomaly count. A row is an
    * anomaly when |v − e_prev| > threshMils, judged from the second row
    * on (the first row seeds the EWMA). Output: (keyCol, n_events,
    * ewma_mils, n_anomalies) — the final smoothed level and how many
    * points broke from it. */
  def ewmaAnomaly(
      df: DataFrame,
      keyCol: String,
      tsCol: Column,
      tieCol: Column,
      valueCol: Column,
      den: Int,
      threshMils: Long): DataFrame = {
    require(den >= 2, s"den must be >= 2: $den")
    val rows = df.select(col(keyCol),
      struct(tsCol.as("t"), tieCol.as("i"),
        floor(valueCol.cast("double") * 1000).cast("long").as("v")).as("_r"))
    val folded = rows
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("_r"))).as("_rs"))
      .select(col(keyCol), size(col("_rs")).cast("long").as("n_events"),
        aggregate(
          col("_rs"),
          struct(lit(-1L).as("e"), lit(0L).as("na")),
          (acc: Column, r: Column) => {
            val v = r.getField("v")
            val seeded = acc.getField("e") =!= -1L
            struct(
              when(!seeded, v)
                .otherwise(floor((acc.getField("e") * (den - 1) + v) / lit(den.toDouble))
                  .cast("long")).as("e"),
              (acc.getField("na") +
                when(seeded && abs(v - acc.getField("e")) > threshMils, 1L)
                  .otherwise(0L)).as("na"))
          }).as("_f"))
    folded.select(col(keyCol), col("n_events"),
      col("_f").getField("e").as("ewma_mils"),
      col("_f").getField("na").as("n_anomalies"))
  }

  /** Per-key one-sided CUSUM change-point detection (Page 1954), exact
    * integer state: in (ts, tie) order the statistic folds as
    * S ← max(0, S + (v − target)), an alarm fires when S > h, and S
    * resets to 0 after each alarm — so n_alarms counts DISTINCT upward
    * level shifts, not every sample above target. Values and state in
    * mils; same row-local sorted fold as [[ewmaAnomaly]] (the recurrence
    * no window frame can express), one shuffle by key, state is two
    * longs per key. Output: (keyCol, n_events, cusum_mils, n_alarms). */
  def cusumAlarms(
      df: DataFrame,
      keyCol: String,
      tsCol: Column,
      tieCol: Column,
      valueCol: Column,
      targetMils: Long,
      threshMils: Long): DataFrame = {
    require(threshMils > 0, s"threshold must be positive: $threshMils")
    val rows = df.select(col(keyCol),
      struct(tsCol.as("t"), tieCol.as("i"),
        floor(valueCol.cast("double") * 1000).cast("long").as("v")).as("_r"))
    rows
      .groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("_r"))).as("_rs"))
      .select(col(keyCol), size(col("_rs")).cast("long").as("n_events"),
        aggregate(
          col("_rs"),
          struct(lit(0L).as("s"), lit(0L).as("na")),
          (acc: Column, r: Column) => {
            val s1 = greatest(lit(0L),
              acc.getField("s") + (r.getField("v") - targetMils))
            val alarm = s1 > threshMils
            struct(
              when(alarm, 0L).otherwise(s1).as("s"),
              (acc.getField("na") + when(alarm, 1L).otherwise(0L)).as("na"))
          }).as("_f"))
      .select(col(keyCol), col("n_events"),
        col("_f").getField("s").as("cusum_mils"),
        col("_f").getField("na").as("n_alarms"))
  }

  /** Theil–Sen robust trend slope per entity — the median of all
    * pairwise slopes (y_b − y_a)/(x_b − x_a), the breakdown-point-29%
    * robust twin of the OLS fit (q_trend_ols): one wild outlier moves
    * OLS arbitrarily but shifts a median of C(n,2) slopes by one rank.
    *
    * Engine-exact discipline: pairs order by the IEEE-double slope
    * (identical from identical int64 dy/dx in any engine) with a total
    * (dy, dx, id_a, id_b) tiebreak; the LOWER MEDIAN is selected by
    * integer rank (n+1)÷2 — a SELECTION, not an average, so the output
    * slope is one exact floor((dy·10⁶)/dx) and never an interpolated
    * float. Equal-x pairs (vertical slope) are excluded by definition.
    *
    * Scale shape: the pair self-join is per-entity (one shuffle on g),
    * candidate volume Σ C(n_g, 2) — bounded by per-entity series length
    * like every ordered-recurrence operator here (the [[ewmaAnomaly]]
    * contract); thin long series systematically upstream if n_g is
    * unbounded. One window pass ranks and counts in the same partition.
    * The join is PINNED to a shuffle join: left to itself the planner
    * broadcasts the (small) point frame, which leaves the join output in
    * scan layout so the window re-exchanges the full C(n,2) PAIR frame
    * (measured 263 MB vs 11 MB at sf0.1) — the shuffle join partitions
    * the two point-frame sides instead, and the window reuses hash(g).
    * At corpus scale the point frame never fits a broadcast anyway, so
    * this also makes the measured plan the 100 TB plan.
    * Input cols: (g, x, y, id); id makes the rank total. */
  def theilSenSlopes(pts: DataFrame): DataFrame = {
    val a = pts.select(col("g"), col("x").as("xa"), col("y").as("ya"), col("id").as("ia"))
    val b = pts.select(col("g"), col("x").as("xb"), col("y").as("yb"), col("id").as("ib"))
    val pairs = a.hint("shuffle_hash").join(b, Seq("g"))
      .filter(col("xa") < col("xb"))
      .select(col("g"), (col("yb") - col("ya")).as("dy"),
        (col("xb") - col("xa")).as("dx"), col("ia"), col("ib"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
      .orderBy((col("dy") * 1000000.0 / col("dx")).asc,
        col("dy"), col("dx"), col("ia"), col("ib"))
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("g"))
    pairs
      .withColumn("_rn", row_number().over(w))
      .withColumn("_np", count(lit(1)).over(wAll))
      .filter(col("_rn") === call_function("div", col("_np") + 1L, lit(2L)))
      .select(col("g"), col("_np").as("n_pairs"),
        floor(col("dy") * 1000000.0 / col("dx")).cast("long").as("slope_ppm"))
  }

  /** Per-key sample autocorrelation at lags 1..maxLag, ENGINE-EXACT: the
    * common-mean ACF r_k = Σ(x_t−x̄)(x_{t−k}−x̄) / Σ(x_t−x̄)² is
    * cleared of fractions by multiplying each deviation by n
    * (dev_t = n·x_t − S, S = Σx), so numerator and denominator are pure
    * integers — carried in DECIMAL(38,0) (the int128 stand-in; per-key
    * bound n³·x̄² ≲ 10³⁰ at a million points per key) and reduced to a
    * signed ppm with truncation-toward-zero on |num| so both engines
    * round identically regardless of their negative-division convention.
    * The serial-correlation diagnostic of a telemetry pipeline (is the
    * signal noise, trend, or oscillation) — the lag-k companion to
    * [[ewmaAnomaly]]'s level tracking.
    *
    * Scale shape: one hash Exchange on the key feeds the totals
    * aggregate, the totals join, the lag window, and the final
    * aggregate — all same-key, one shuffle total; lags are window
    * `lag()` columns (no self-join). Rows with t ≤ k fall out of num_k
    * as null products (sum skips them), exactly the t = k+1..n sum.
    * Output: (key, n, acf1_ppm..acf<maxLag>_ppm); constant series
    * (den = 0) and short series (n ≤ k) report 0. */
  def acfPpm(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      tieCol: Column,
      valCol: Column,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1 && maxLag <= 10, s"maxLag must be in 1..10: $maxLag")
    val base = df.select(keyCol.as("key"), tsCol.as("_t"), tieCol.as("_tie"),
      valCol.as("_x"))
    // Per-key (n, Σx) as UNORDERED windows over the same hash(key)
    // partitioning the lag window needs — NOT a groupBy + join back:
    // the join's broadcast plan flips to SMJ once the totals frame's
    // size estimate crosses the threshold (measured: 3 data-sized
    // shuffle passes instead of 1 on the 5x probe replica), and at
    // 10^9 entities a broadcast of per-entity totals is wrong anyway.
    val wAll = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("key"))
      .orderBy(col("_t"), col("_tie"))
    val dev = base
      .withColumn("_n", count(lit(1)).over(wAll))
      .withColumn("_s", sum(col("_x")).over(wAll))
      .withColumn("_dev", expr("CAST(_n AS DECIMAL(38,0)) * _x - _s"))
    val lagged = (1 to maxLag).foldLeft(dev) { (d, k) =>
      d.withColumn(s"_d$k", lag(col("_dev"), k).over(w))
    }
    val aggs = Seq(max(col("_n")).as("n"),
      sum(col("_dev") * col("_dev")).as("_den")) ++
      (1 to maxLag).map(k =>
        coalesce(sum(col("_dev") * col(s"_d$k")), lit(0L).cast("decimal(38,0)"))
          .as(s"_num$k"))
    val g = lagged.groupBy(col("key")).agg(aggs.head, aggs.tail: _*)
    val out = (1 to maxLag).foldLeft(g) { (d, k) =>
      d.withColumn(s"acf${k}_ppm",
        when(col("_den") > 0,
          when(col(s"_num$k") < 0,
            -expr(s"abs(_num$k) * 1000000 DIV _den"))
            .otherwise(expr(s"_num$k * 1000000 DIV _den")).cast("long"))
          .otherwise(0L))
    }
    out.select((col("key") +: col("n") +:
      (1 to maxLag).map(k => col(s"acf${k}_ppm"))): _*)
  }

  /** Sentinel "infinite" DP cost — far above any reachable alignment
    * cost (≤ pattern length × max |value| mils) yet small enough that
    * BIG + cost never overflows a long. */
  private val DtwBig = 1L << 40

  /** Subsequence DTW pattern search: rank entities by how well their
    * value sequence contains a segment matching a fixed query pattern —
    * the shape-query primitive (find the users whose telemetry shows
    * this spike-and-recover profile) that exact equality or correlation
    * cannot express because matching segments stretch in time.
    *
    * Semantics: asymmetric-step DTW (Sakoe–Chiba step I — each pattern
    * step advances exactly one row; a sequence element may repeat via
    * the vertical step) with OPEN start and end: cost(i,j) = |v_j − p_i|
    * + min(dp_{i−1}[j], dp_{i−1}[j−1]), dp_1[j] = |v_j − p_1|, answer =
    * min_j dp_m[j]. This step pattern is chosen deliberately: it removes
    * the same-row dp_i[j−1] dependency, so each DP level is a pure MAP
    * over the previous level — expressible as builtin higher-order
    * functions with NO per-row UDF and replayable level-by-level in SQL
    * (a lag() window per level) for the oracle.
    *
    * Spark shape: one shuffle groups each entity's first `maxLen` rows
    * (sort_array + slice — the [[ewmaAnomaly]] fold class); the whole DP
    * is then `aggregate` over the pattern literal with a nested
    * `transform` over the sequence — row-local, codegen'd, O(m·maxLen)
    * per entity, state one long array. Entities are independent: 100 TB
    * scales as width. Top-k is a TakeOrderedAndProject, never a global
    * sort.
    *
    * All-integer mils costs; ties (equal cost) break to the smaller
    * entity id, equal-cost end positions to the EARLIEST j
    * (array_position returns the first minimum). Output, best `topK`
    * entities: (keyCol, n_pts, best_cost, best_end). */
  def dtwMatch(
      df: DataFrame,
      keyCol: String,
      tsCol: Column,
      tieCol: Column,
      valueCol: Column,
      patternMils: Seq[Long],
      maxLen: Int,
      topK: Int): DataFrame = {
    require(patternMils.nonEmpty && patternMils.size <= 32,
      s"pattern length must be in 1..32: ${patternMils.size}")
    require(maxLen >= 1, s"maxLen must be >= 1: $maxLen")
    require(topK >= 1, s"topK must be >= 1: $topK")
    val rows = df.select(col(keyCol),
      struct(tsCol.as("t"), tieCol.as("i"),
        floor(valueCol.cast("double") * 1000).cast("long").as("v")).as("_r"))
    val seqs = rows.groupBy(col(keyCol))
      .agg(slice(sort_array(collect_list(col("_r"))), 1, maxLen).as("_rs"))
      .select(col(keyCol),
        transform(col("_rs"), r => r.getField("v")).as("_seq"))
    val dp0 = transform(col("_seq"), v => abs(v - lit(patternMils.head)))
    val dpFinal = aggregate(
      lit(patternMils.tail.toArray), dp0,
      (acc: Column, p: Column) => transform(col("_seq"), (v, j) =>
        abs(v - p) + least(
          element_at(acc, j + 1),
          when(j === 0, lit(DtwBig)).otherwise(element_at(acc, j)))))
    seqs
      .select(col(keyCol), size(col("_seq")).cast("long").as("n_pts"),
        dpFinal.as("_dp"))
      .withColumn("best_cost", array_min(col("_dp")))
      .withColumn("best_end", array_position(col("_dp"), col("best_cost")))
      .drop("_dp")
      .orderBy(col("best_cost"), col(keyCol))
      .limit(topK)
  }

  /** The DuckDB replay of [[dtwMatch]] over the `events` table,
    * GENERATED from the same pattern literal so query and oracle cannot
    * drift: one CTE per DP level (the previous level's dp reached via
    * lag() over j — legal because the asymmetric step never reads the
    * current level), then min/argmin per entity and the same
    * (cost, key) top-k order. */
  def dtwMatchEventsSql(patternMils: Seq[Long], maxLen: Int, topK: Int): String = {
    val lvls = patternMils.zipWithIndex.drop(1).map { case (p, i) =>
      s"""d${i + 1} AS (SELECT user_id, j, v,
         |  abs(v - $p) + least(dp, coalesce(lag(dp) OVER (PARTITION BY user_id ORDER BY j), $DtwBig)) AS dp
         |  FROM d$i)""".stripMargin
    }
    s"""WITH r AS (SELECT user_id, CAST(floor(value*1000) AS BIGINT) AS v,
       |  row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS j
       |  FROM events),
       |s AS (SELECT user_id, v, j FROM r WHERE j <= $maxLen),
       |d1 AS (SELECT user_id, j, v, abs(v - ${patternMils.head}) AS dp FROM s),
       |${lvls.mkString(",\n")},
       |f AS (SELECT user_id, count(*) OVER (PARTITION BY user_id) AS n_pts,
       |        dp AS best_cost, j AS best_end,
       |        row_number() OVER (PARTITION BY user_id ORDER BY dp, j) AS rk
       |      FROM d${patternMils.size})
       |SELECT user_id, CAST(n_pts AS BIGINT) AS n_pts, best_cost, best_end
       |FROM f WHERE rk = 1
       |ORDER BY best_cost, user_id LIMIT $topK""".stripMargin
  }

  /** Lead–lag CROSS-correlation between two categories' event-count
    * series — does activity in `keyA` precede activity in `keyB`, and
    * by how many buckets? The causal-precursor diagnostic ([[acfPpm]]'s
    * two-series companion): r_xy(k) correlates x_t with y_{t+k} over a
    * shared dense bucket grid (missing buckets count 0, exactly what a
    * count series means).
    *
    * ENGINE-EXACT, libm-free: deviations are n-cleared integers
    * (dev_t = n·x_t − Σx), and instead of r (whose sqrt(den) ties the
    * result to libm) the output is the SIGNED SQUARED correlation in
    * ppm: sign(num_k) · floor(10⁶·num_k² / (Σdevx²·Σdevy²)) — monotone
    * in |r| with r's sign, so ranking and thresholding behave like r.
    * DECIMAL(38,0) carries num_k² ≲ (n²·x̄·n·x̄)²; overflow-safe to
    * ~10⁶ events per bucket per series at 720 buckets — pre-aggregate
    * to coarser buckets past that.
    *
    * Scale shape: ONE data-sized map-side-combined aggregation (the
    * (key, bucket) counts); everything after runs on the bucket grid
    * (n rows), broadcast-joined — the lag alignment is a bucket
    * equi-join (bucket = bucket + k), never a global window, so no
    * single-partition WindowExec at any scale. Output: one row per lag
    * 0..maxLag: (lag, n_buckets, xcorr_r2s_ppm). */
  def crossCorrPpm(
      df: DataFrame,
      keyCol: Column,
      bucketCol: Column,
      keyA: String,
      keyB: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 0 && maxLag <= 24, s"maxLag must be in 0..24: $maxLag")
    require(keyA != keyB, "keyA and keyB must differ")
    val cnt = df.select(keyCol.as("_k"), bucketCol.as("_b"))
      .filter(col("_k").isin(keyA, keyB))
      .groupBy(col("_k"), col("_b")).agg(count(lit(1)).as("_c"))
    val grid = cnt.agg(min(col("_b")).as("_lo"), max(col("_b")).as("_hi"))
      .select(explode(sequence(col("_lo"), col("_hi"))).as("_b"))
    val xy = grid
      .join(cnt.filter(col("_k") === keyA).select(col("_b"), col("_c").as("_x")),
        Seq("_b"), "left")
      .join(cnt.filter(col("_k") === keyB).select(col("_b"), col("_c").as("_y")),
        Seq("_b"), "left")
      .na.fill(0L, Seq("_x", "_y"))
    val tot = xy.agg(count(lit(1)).as("_n"),
      sum(col("_x")).as("_sx"), sum(col("_y")).as("_sy"))
    val dev = xy.crossJoin(broadcast(tot))
      .select(col("_b"), col("_n"),
        expr("CAST(_n AS DECIMAL(38,0)) * _x - _sx").as("_dx"),
        expr("CAST(_n AS DECIMAL(38,0)) * _y - _sy").as("_dy"))
    val den = dev.agg(
      sum(col("_dx") * col("_dx")).as("_ddx"),
      sum(col("_dy") * col("_dy")).as("_ddy"))
    val laggedY = dev.select(col("_b"), col("_dy"))
      .withColumn("lag", explode(sequence(lit(0), lit(maxLag))))
      .select((col("_b") - col("lag")).as("_b"), col("lag"),
        col("_dy").as("_dy2"))
    val nums = dev.select(col("_b"), col("_dx"), col("_n"))
      .join(laggedY, Seq("_b"))
      .groupBy(col("lag"))
      .agg(max(col("_n")).as("n_buckets"),
        coalesce(sum(col("_dx") * col("_dy2")),
          lit(0L).cast("decimal(38,0)")).as("_num"))
    nums.crossJoin(broadcast(den))
      .withColumn("xcorr_r2s_ppm",
        when(col("_ddx") > 0 && col("_ddy") > 0,
          signum(col("_num")).cast("long") *
            expr("CAST(_num * _num * 1000000 DIV (_ddx * _ddy) AS BIGINT)"))
          .otherwise(0L))
      .select(col("lag").cast("long").as("lag"), col("n_buckets"),
        col("xcorr_r2s_ppm"))
  }

  /** Holt double-exponential smoothing per entity — [[ewmaAnomaly]]'s
    * trend-aware sibling: a level + trend recurrence (α = β = 1/den)
    * that tracks a drifting series where a plain EWMA lags
    * systematically. Like every floor-rounded recurrence here, each
    * state depends on the ROUNDED previous state, so no window frame
    * expresses it — the fold runs row-locally over the sorted per-entity
    * sequence (`aggregate` HOF), one shuffle on the entity key total.
    *
    *   pred_t = l_{t−1} + b_{t−1}
    *   l_t    = ⌊((den−1)·pred_t + v_t) / den⌋
    *   b_t    = ⌊((l_t − l_{t−1}) + (den−1)·b_{t−1}) / den⌋
    *
    * Seeds l_1 = v_1, b_1 = 0 (trend learned from data, not a two-point
    * guess — documented contract). The floor is IEEE-double division
    * (exact and engine-identical below 2⁵³, the [[ewmaAnomaly]]
    * precedent), and the one-step-ahead SUM OF ABSOLUTE ERRORS ships
    * alongside — the integer backtest metric (an SSE would square
    * mils past int64 on long series).
    *
    * Output: (key, n_events, level_mils, trend_mils, sae_mils). */
  def holtSmooth(
      df: DataFrame,
      keyCol: String,
      tsCol: Column,
      tieCol: Column,
      valueCol: Column,
      den: Int): DataFrame = {
    require(den >= 2, s"den must be >= 2: $den")
    val rows = df.select(col(keyCol),
      struct(tsCol.as("t"), tieCol.as("i"),
        floor(valueCol.cast("double") * 1000).cast("long").as("v")).as("_r"))
    val d = den.toDouble
    rows.groupBy(col(keyCol))
      .agg(sort_array(collect_list(col("_r"))).as("_rs"))
      .select(col(keyCol), size(col("_rs")).cast("long").as("n_events"),
        aggregate(
          col("_rs"),
          struct(lit(0L).as("n"), lit(0L).as("l"), lit(0L).as("b"),
            lit(0L).as("sae")),
          (acc: Column, r: Column) => {
            val v = r.getField("v")
            val pred = acc.getField("l") + acc.getField("b")
            val l1 = floor(((pred * (den - 1) + v) / lit(d))).cast("long")
            val b1 = floor((((l1 - acc.getField("l")) +
              acc.getField("b") * (den - 1)) / lit(d))).cast("long")
            struct(
              (acc.getField("n") + 1L).as("n"),
              when(acc.getField("n") === 0L, v).otherwise(l1).as("l"),
              when(acc.getField("n") === 0L, 0L).otherwise(b1).as("b"),
              (acc.getField("sae") +
                when(acc.getField("n") === 0L, 0L)
                  .otherwise(abs(v - pred))).as("sae"))
          }).as("_f"))
      .select(col(keyCol), col("n_events"),
        col("_f.l").as("level_mils"), col("_f.b").as("trend_mils"),
        col("_f.sae").as("sae_mils"))
  }

  /** Exact rolling LOWER-median over a trailing TIME window per entity —
    * the robust twin of q_rolling_window's rolling sum (one fat outlier
    * moves a 1-hour mean for the whole hour; the median shrugs). Lower
    * median = sorted value at rank ⌈n/2⌉ — always an OBSERVED value,
    * never an interpolated average, so integer-exact in any engine and
    * well-defined for even n without a tie rule.
    *
    * Implementation: collect_list over a rangeBetween window (the frame
    * is the trailing `windowUs` µs), array_sort, element_at. Per-row
    * cost is O(k·log k) in the window population k — the honest price
    * of an exact sliding median without mergeable sketch state; the
    * window state is bounded by events-per-window per entity, so thin
    * pathologically dense entities upstream (the [[ewmaAnomaly]]
    * contract). One Exchange on the entity key; the sort and selection
    * are row-local.
    *
    * Input: (e, ts_us, id, v); output adds (n_win, med). Simultaneous
    * timestamps share a frame (RANGE semantics) — both rows see the
    * union, deterministically. */
  def rollingMedian(
      pts: DataFrame,
      entityCol: Column,
      tsUsCol: Column,
      idCol: Column,
      valCol: Column,
      windowUs: Long): DataFrame = {
    require(windowUs >= 0, s"windowUs must be >= 0: $windowUs")
    val w = Window.partitionBy(col("_e")).orderBy(col("_ts"))
      .rangeBetween(-windowUs, 0L)
    pts.select(entityCol.as("_e"), tsUsCol.as("_ts"), idCol.as("_id"),
        valCol.as("_v"))
      .withColumn("_win", array_sort(collect_list(col("_v")).over(w)))
      .select(col("_id").as("id"), col("_e").as("e"), col("_ts").as("ts_us"),
        size(col("_win")).cast("long").as("n_win"),
        element_at(col("_win"),
          expr("CAST((size(_win) + 1) DIV 2 AS INT)")).as("med"))
  }

  /** Per-key best single change point by binary segmentation — the
    * level-shift LOCATOR that [[cusumAlarms]]'s alarm counter doesn't
    * give: for each split t the between-segment separation statistic
    *
    *   s(t) = floor((n·P_t − t·T)² / (t·(n−t)))
    *        = t·(n−t)·(mean_left − mean_right)², cleared of divisions
    *
    * (P_t = prefix sum, T = total) is maximized over t ∈ [1, n−1]; ties
    * break to the SMALLEST t. s(t) is the CUSUM-statistic square and the
    * n·σ²-scaled variance-reduction of the split, so argmax s = the
    * binary-segmentation change point. One floor-division per t, replayed
    * identically by the oracle; exact while n·Σ|v| < 3·10⁹ per key
    * (longs — per-entity series, not global ones).
    *
    * Scale shape: ONE shuffle (group-collect by key), then a row-local
    * O(n²) fold over each key's sorted series (n = per-entity events;
    * the oracle's window form is the O(n log n) equivalent). Keys with
    * n < 2 report NULLs. Output: (keyCol, n, t_split, s_max). */
  def changepointSplit(
      df: DataFrame,
      keyCol: String,
      tsCol: Column,
      tieCol: Column,
      valueCol: Column): DataFrame = {
    val rows = df.select(col(keyCol),
      struct(tsCol.as("t"), tieCol.as("i"),
        floor(valueCol.cast("double") * 1000).cast("long").as("v")).as("_r"))
    rows.groupBy(col(keyCol))
      .agg(expr("transform(sort_array(collect_list(_r)), p -> p.v)").as("_vs"))
      .withColumn("_n", size(col("_vs")).cast("long"))
      .withColumn("_tt", expr("aggregate(_vs, 0L, (a, v) -> a + v)"))
      // prefix sums: _ps(i+1) = v₁+…+vᵢ (leading 0 keeps indexing 1-based)
      .withColumn("_ps", expr(
        "aggregate(_vs, array(0L), (acc, v) -> concat(acc, array(element_at(acc, -1) + v)))"))
      // n < 2 → no admissible split (and sequence(1, 0) would DESCEND,
      // not come back empty — hence the explicit guard)
      .withColumn("_best", expr(
        """IF(_n < 2, named_struct('t', CAST(NULL AS BIGINT), 's', CAST(NULL AS BIGINT)),
          |aggregate(
          |  transform(sequence(1, CAST(_n - 1 AS INT)),
          |    t -> named_struct(
          |      't', CAST(t AS BIGINT),
          |      's', ((_n * element_at(_ps, t + 1) - t * _tt)
          |            * (_n * element_at(_ps, t + 1) - t * _tt))
          |           DIV (t * (_n - t)))),
          |  named_struct('t', CAST(NULL AS BIGINT), 's', CAST(NULL AS BIGINT)),
          |  (acc, x) -> IF(acc.s IS NULL OR x.s > acc.s, x, acc)))""".stripMargin))
      .select(col(keyCol), col("_n").as("n"),
        col("_best.t").as("t_split"), col("_best.s").as("s_max"))
  }

  /** Additive Holt-Winters (triple exponential smoothing) with
    * period-P seasonality — the seasonal member of the forecasting
    * family ([[holtSmooth]] has level+trend; this adds the repeating
    * weekly/daily shape). Dyadic smoothing weights (α = 1/2,
    * β = γ = 1/4) keep every update ONE floored division of integers:
    *
    *   t = 1:  l = y, b = 0, s[*] = 0    (cold-start init, documented)
    *   t ≥ 2, j = (t−1) mod P:
    *     l' = ⌊(y − s[j] + l + b) / 2⌋
    *     b' = ⌊(l' − l + 3b) / 4⌋
    *     s[j]' = ⌊(y − l' + 3·s[j]) / 4⌋
    *
    * (floor, not truncation — both engines' SQL floor() on the float
    * division, the [[holtSmooth]] convention; magnitudes stay ≪ 2⁵³ so
    * the doubles are exact). Forecast h steps out: l + h·b +
    * s[(n−1+h) mod P].
    *
    * Scale shape: ONE (key, step) pre-aggregation upstream, a
    * group-collect shuffle, and a row-local fold — series length is
    * span-bounded (days in window), keys scale as width. Output:
    * (keyCol, n, h = 1..horizon, fc) exploded per horizon step. */
  def holtWinters(
      series: DataFrame,
      keyCol: String,
      stepCol: Column,
      valueCol: Column,
      period: Int,
      horizon: Int): DataFrame = {
    require(period >= 2, s"period must be >= 2: $period")
    require(horizon >= 1, s"horizon must be >= 1: $horizon")
    val rows = series.select(col(keyCol),
      struct(stepCol.as("t"), valueCol.cast("long").as("y")).as("_r"))
    // no let-binding in SQL lambdas: the l' expression repeats verbatim
    // where the recurrence needs it (cheap — the fold runs once per step)
    val sj = s"element_at(acc.s, CAST(acc.t % $period AS INT) + 1)"
    val lNew = s"CAST(FLOOR((y - $sj + acc.l + acc.b) / 2.0) AS BIGINT)"
    val folded = rows.groupBy(col(keyCol))
      .agg(expr("transform(sort_array(collect_list(_r)), p -> p.y)").as("_ys"))
      .withColumn("_st", expr(
        s"""aggregate(_ys,
           |  named_struct('l', 0L, 'b', 0L,
           |    's', array_repeat(0L, $period), 't', 0L),
           |  (acc, y) -> IF(acc.t = 0,
           |    named_struct('l', y, 'b', 0L, 's', acc.s, 't', 1L),
           |    named_struct(
           |      'l', $lNew,
           |      'b', CAST(FLOOR(($lNew - acc.l + 3 * acc.b) / 4.0) AS BIGINT),
           |      's', transform(sequence(0, ${period - 1}),
           |        i -> IF(i = CAST(acc.t % $period AS INT),
           |          CAST(FLOOR((y - $lNew + 3 * $sj) / 4.0) AS BIGINT),
           |          element_at(acc.s, CAST(i AS INT) + 1))),
           |      't', acc.t + 1)))""".stripMargin))
      .select(col(keyCol), size(col("_ys")).cast("long").as("n"), col("_st"))
    folded
      .select(col(keyCol), col("n"), col("_st"),
        explode(expr(s"sequence(1, $horizon)")).as("h"))
      .select(col(keyCol), col("n"), col("h").cast("long").as("h"),
        expr(s"_st.l + h * _st.b + element_at(_st.s, CAST((n - 1 + h) % $period AS INT) + 1)")
          .as("fc"))
  }

  /** Mann–Kendall trend test per key — the SIGNIFICANCE companion of
    * [[theilSenSlopes]] (Theil–Sen estimates the slope; MK tests whether
    * a monotone trend exists at all): S = Σ_{i<j} sign(y_j − y_i) over
    * the per-key series ordered by x (callers must pre-aggregate to ONE
    * row per (key, x) so equal-time pairs cannot occur), with the
    * tie-corrected variance 18·Var(S) = n(n−1)(2n+5) − Σ_t t(t−1)(2t+5)
    * over the y-tie group sizes t, and the continuity-corrected z²
    * shipped as the exact integer
    *
    *   z2_ppm = 10⁶·18·(|S|−1)² DIV (n(n−1)(2n+5) − Σ_t t(t−1)(2t+5))
    *
    * (0 when S = 0 — which subsumes the all-tied series, whose variance
    * is also 0). All-integer: no libm, no float accumulation,
    * engine-exact against any SQL oracle computing the same floors.
    *
    * Scale shape: the pair self-join is per-key and PINNED to a shuffle
    * join exactly like [[theilSenSlopes]] (left alone the planner
    * broadcasts the small point frame, leaving the C(n,2) pair frame in
    * scan layout); n, S, and the tie correction are three same-key
    * aggregates joined on g, so every Exchange hashes g. Pair volume
    * Σ C(n_g, 2) is bounded by per-key series length — with an
    * hour-of-month x domain (n ≤ 744), (|S|−1)²·18·10⁶ ≲ 1.4·10¹⁸
    * stays inside int64. Input cols: (g, x, y), one row per (g, x).
    * Output: (g, n, s, z2_ppm); keys with n = 1 (no pairs) drop. */
  def mannKendall(pts: DataFrame): DataFrame = {
    val a = pts.select(col("g"), col("x").as("xa"), col("y").as("ya"))
    val b = pts.select(col("g"), col("x").as("xb"), col("y").as("yb"))
    val s = a.hint("shuffle_hash").join(b, Seq("g"))
      .filter(col("xa") < col("xb"))
      .groupBy(col("g"))
      .agg(sum(signum(col("yb") - col("ya")).cast("long")).as("s"))
    val n = pts.groupBy(col("g")).agg(count(lit(1)).as("n"))
    val tc = pts.groupBy(col("g"), col("y")).agg(count(lit(1)).as("_t"))
      .groupBy(col("g"))
      .agg(sum(expr("_t * (_t - 1) * (2 * _t + 5)")).as("_tie"))
    n.join(s, Seq("g")).join(tc, Seq("g"))
      .withColumn("_v18", expr("n * (n - 1) * (2 * n + 5)") - col("_tie"))
      .withColumn("z2_ppm",
        when(col("s") === 0, lit(0L)).otherwise(
          when(col("_v18") > 0,
            expr("(abs(s) - 1) * (abs(s) - 1) * 18 * 1000000 DIV _v18"))))
      .select(col("g"), col("n"), col("s"), col("z2_ppm"))
  }

  /** Partial autocorrelation at lags 1..3 per entity — the AR-order
    * identification companion of [[acfPpm]] (an AR(1) process has acf
    * decaying geometrically at EVERY lag but pacf cutting off after
    * lag 1; acf alone cannot tell order). Solved via the Yule–Walker
    * normal equations in CRAMER form: pacf(k) is the ratio of two
    * k×k Toeplitz determinants over the acf values, which for k ≤ 3 is
    * closed-form POLYNOMIAL arithmetic in the acf ppm integers
    * (r0 = 10⁶):
    *
    *   pacf₁ = r₁
    *   pacf₂ = (r₂r₀ − r₁²) / (r₀² − r₁²)
    *   pacf₃ = det[[r₀,r₁,r₁],[r₁,r₀,r₂],[r₂,r₁,r₃]] /
    *           det[[r₀,r₁,r₂],[r₁,r₀,r₁],[r₂,r₁,r₀]]
    *
    * — no Durbin–Levinson driver recursion, no matrix solve: each ppm
    * ratio is one signed DECIMAL(38,0) floor-division (truncation
    * toward zero, the [[acfPpm]] sign idiom) on columns of the acf
    * frame, replayed verbatim by the oracle. Degenerate denominators
    * (|r₁| = 10⁶, or a non-positive-definite floored system) report
    * NULL rather than a fabricated coefficient.
    *
    * Scale shape: exactly [[acfPpm]]'s one shuffle — everything here is
    * row-local on the per-entity acf frame. Output:
    * (key, n, pacf1_ppm, pacf2_ppm, pacf3_ppm). */
  def pacfPpm(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      tieCol: Column,
      valCol: Column): DataFrame = {
    val acf = acfPpm(df, keyCol, tsCol, tieCol, valCol, maxLag = 3)
    def sdiv(num: String, den: String): Column =
      when(expr(num) < 0, -expr(s"abs($num) * 1000000 DIV ($den)"))
        .otherwise(expr(s"($num) * 1000000 DIV ($den)")).cast("long")
    acf
      .withColumn("_r1", expr("CAST(acf1_ppm AS DECIMAL(38,0))"))
      .withColumn("_r2", expr("CAST(acf2_ppm AS DECIMAL(38,0))"))
      .withColumn("_r3", expr("CAST(acf3_ppm AS DECIMAL(38,0))"))
      .withColumn("_num2", expr("_r2 * 1000000 - _r1 * _r1"))
      .withColumn("_den2", expr("CAST(1000000 AS DECIMAL(38,0)) * 1000000 - _r1 * _r1"))
      .withColumn("_det3", expr(
        """1000000 * (CAST(1000000 AS DECIMAL(38,0)) * 1000000 - _r1 * _r1)
          |  - _r1 * (_r1 * 1000000 - _r1 * _r2)
          |  + _r2 * (_r1 * _r1 - 1000000 * _r2)""".stripMargin))
      .withColumn("_det3s", expr(
        """1000000 * (1000000 * _r3 - _r2 * _r1)
          |  - _r1 * (_r1 * _r3 - _r2 * _r2)
          |  + _r1 * (_r1 * _r1 - 1000000 * _r2)""".stripMargin))
      .withColumn("pacf2_ppm", when(col("_den2") > 0, sdiv("_num2", "_den2")))
      .withColumn("pacf3_ppm", when(col("_det3") > 0, sdiv("_det3s", "_det3")))
      .select(col("key"), col("n"), col("acf1_ppm").as("pacf1_ppm"),
        col("pacf2_ppm"), col("pacf3_ppm"))
  }

  /** Ljung–Box portmanteau white-noise test over lags 1..3 per entity —
    * "is there ANY serial structure at all?", the gate before reading
    * individual [[acfPpm]]/[[pacfPpm]] coefficients (each lag alone at
    * ±2/√n invites multiple-testing false alarms; the portmanteau sums
    * them once):
    *
    *   Q = n(n+2) · Σ_k r_k²/(n−k)
    *
    * cleared over the common denominator (n−1)(n−2)(n−3) so the milli
    * rendering is ONE DECIMAL(38,0) floor-division over the acf ppm
    * integers — no χ² table at runtime: the 95% threshold for 3 df
    * ships as the compile-time literal 7815 milli (the ppm-ladder
    * convention) and `reject` is the thresholded verdict. Series with
    * n ≤ 3 report NULL. Scale shape: [[acfPpm]]'s one shuffle +
    * row-local arithmetic. Output: (key, n, q_milli, reject). */
  def ljungBox(
      df: DataFrame,
      keyCol: Column,
      tsCol: Column,
      tieCol: Column,
      valCol: Column): DataFrame = {
    val acf = acfPpm(df, keyCol, tsCol, tieCol, valCol, maxLag = 3)
    acf
      .withColumn("_r1", expr("CAST(acf1_ppm AS DECIMAL(38,0))"))
      .withColumn("_r2", expr("CAST(acf2_ppm AS DECIMAL(38,0))"))
      .withColumn("_r3", expr("CAST(acf3_ppm AS DECIMAL(38,0))"))
      .withColumn("_num", expr(
        """_r1 * _r1 * (n - 2) * (n - 3) + _r2 * _r2 * (n - 1) * (n - 3)
          |  + _r3 * _r3 * (n - 1) * (n - 2)""".stripMargin))
      .withColumn("q_milli",
        when(col("n") > 3, expr(
          """CAST(CAST(n AS DECIMAL(38,0)) * (n + 2) * _num * 1000
            |  DIV (CAST(n - 1 AS DECIMAL(38,0)) * (n - 2) * (n - 3)
            |       * 1000000000000) AS BIGINT)""".stripMargin)))
      .withColumn("reject",
        when(col("q_milli").isNotNull, (col("q_milli") > 7815L).cast("long")))
      .select(col("key"), col("n"), col("q_milli"), col("reject"))
  }
}
