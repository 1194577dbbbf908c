package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sketch-based approximate aggregation — the 100 TB answer when exact
  * distinct counts / percentiles stop fitting the shuffle budget. The
  * reference computes only exact aggregates (its corpus is single-node,
  * /root/reference/benchmark.py); at cluster scale the two workhorses are:
  *
  *  - HLL(++) count-distinct: fixed-size (2^lgK registers) state per
  *    group instead of a hash set of every key, map-side combined, and
  *    MERGEABLE — per-day/per-partition sketches re-aggregate by register
  *    max, so a year of daily sketches rolls up without touching raw data.
  *  - GK / KLL quantile sketches: bounded rank error ε = 1/accuracy with
  *    O(1/ε · log εn) state, vs an exact per-group sort.
  *
  * Every helper here emits the EXACT value alongside machine-checkable
  * accuracy/merge invariants (booleans), so the oracle compare stays
  * deterministic while the sketch path itself is exercised end-to-end.
  */
object Approx {

  /** Per-`keyCol` distinct `idCol` three ways: exact, HLL++
    * (`approx_count_distinct`, relative sd `rsd`), and a Datasketches HLL
    * path that pins the MERGE guarantee — per-split sketches union-merged
    * must still estimate within tolerance of exact (register-wise max
    * loses no registers; this is what makes per-partition/per-day rollups
    * sound at scale). NOTE the merged estimate is not bit-identical to
    * the whole-group sketch's: a directly-built Datasketches HLL carries
    * a HIP estimator that a union invalidates (falls back to the
    * composite estimator), so the checkable contract is the error bound,
    * not estimate equality.
    *
    * Output: key, n_exact, hll_ok (|hll−exact| ≤ tolFrac·exact),
    * merge_invariant (|merged-sketch estimate − exact| ≤ tolFrac·exact).
    */
  def distinctSketchCheck(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      splitCol: Column,
      rsd: Double = 0.01,
      tolFrac: Double = 0.05,
      lgConfigK: Int = 12): DataFrame = {
    val whole = df.groupBy(col(keyCol)).agg(
      count_distinct(col(idCol)).as("n_exact"),
      approx_count_distinct(col(idCol), rsd).as("_hll"))
    val merged = df.withColumn("_half", splitCol)
      .groupBy(col(keyCol), col("_half"))
      .agg(hll_sketch_agg(col(idCol), lit(lgConfigK)).as("_sk"))
      .groupBy(col(keyCol))
      .agg(hll_sketch_estimate(hll_union_agg(col("_sk"), lit(false))).as("_sk_merged"))
    whole.join(merged, keyCol)
      .select(col(keyCol), col("n_exact"),
        (abs(col("_hll") - col("n_exact")) <= col("n_exact") * tolFrac).as("hll_ok"),
        (abs(col("_sk_merged") - col("n_exact")) <= col("n_exact") * tolFrac)
          .as("merge_invariant"))
  }

  /** BIT-DETERMINISTIC HLL register census — the complement of
    * [[distinctSketchCheck]] (which bounds the ERROR of the library
    * sketches): an HLL whose full register state is reproducible in
    * plain SQL on any engine, so the MERGE LAW itself — shard sketches
    * re-aggregated by register max equal the single-pass sketch — is
    * hash-checkable bit for bit, not just within a tolerance band.
    *
    * Hash = md5(value as string), consumed as hex nibbles: the first
    * b/4 nibbles are the register index, the next 16 nibbles (64 bits)
    * feed ρ = leading-zero count + 1, computed by STRING arithmetic
    * (`trim(LEADING '0')` + a 1-nibble CASE) that evaluates identically
    * in Spark and DuckDB — no float, no platform hash.
    *
    * The ENGINE PATH deliberately computes per-`shardCol` sketches
    * first and merges them (groupBy shard+register max, then register
    * max / count sum) — the year-of-daily-sketches rollup shape; the
    * oracle replays the single-pass census, so cross-engine equality
    * proves the merge law end-to-end. State is ≤ 2^b rows per group —
    * map-side combinable, fixed size at any corpus scale; duplicates
    * need no dedup pass (max is idempotent on repeats, which is the
    * whole point of HLL vs count_distinct's hash-set shuffle).
    *
    * The cardinality ESTIMATE (α·m²/Σ2^−ρ + low/high-range corrections)
    * is intentionally NOT emitted: it is float math derivable from this
    * census by any reader, while the census itself is the mergeable,
    * exactly-reproducible object. Output: (register, max_rho, n_rows)
    * ordered by register, absent registers omitted (the zero-register
    * count is 2^b − row count). */
  def hllRegisterCensus(
      df: DataFrame,
      valueCol: Column,
      shardCol: Column,
      b: Int = 8): DataFrame =
    hllRegisterCensusBy(df, lit(0), valueCol, shardCol, b)
      .select(col("register"), col("max_rho"), col("n_rows"))

  /** KMV (k-minimum-values / bottom-k) sketch — the third deterministic
    * sketch face after [[hllRegisterCensus]] (cardinality state) and the
    * library-backed [[distinctSketchCheck]]: the k smallest md5 values
    * of the DISTINCT keys. Three properties make it the workhorse it is:
    *
    *  - MERGEABLE EXACTLY: bottom-k of a union of shard bottom-ks ==
    *    bottom-k of the whole (min-order is global) — the engine path
    *    computes per-shard bottom-ks and merges, the oracle replays one
    *    pass, and the hash compare proves the law bit for bit.
    *  - a UNIFORM DISTINCT SAMPLE: md5 order is hash order, so the k
    *    survivors are a uniform sample of the distinct keys — the
    *    "show me 100 random users" primitive with fixed state.
    *  - a CARDINALITY ESTIMATOR: (k−1)/hash_frac(h_k) estimates the
    *    distinct count (not emitted — float; derivable from h_k).
    *
    * Scale shape: one distinct pass (map-side combinable), per-shard
    * sort is top-k (never a global sort — rank WITHIN shard first, the
    * same WindowGroupLimit push q_topk rides), merge ranks only
    * |shards|·k rows. Output: (rank, h, <value>), rank 1..k by hash. */
  def kmvSketch(
      df: DataFrame,
      valueCol: Column,
      shardCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val distinctKeys = df.select(shardCol.as("_s"), valueCol.as("value"))
      .groupBy(col("_s"), col("value")).agg(count(lit(1)).as("_n")) // distinct per shard
      .withColumn("_h", md5(col("value").cast("string").cast("binary")))
    val wShard = Window.partitionBy(col("_s")).orderBy(col("_h"), col("value"))
    val shardBottom = distinctKeys
      .withColumn("_r", row_number().over(wShard))
      .filter(col("_r") <= k)
    // merge: global bottom-k over ≤ |shards|·k rows via orderBy+limit
    // (TakeOrderedAndProject — per-partition top-k then a k-row driver
    // merge, NEVER a global sort or an unpartitioned window); a key
    // present in two shards dedups first (same hash, same value). Ranks
    // come from a k×k broadcast self-join count — k² comparisons on a
    // k-row frame, domain-bounded by construction.
    val survivors = shardBottom.select(col("_h"), col("value")).distinct()
      .orderBy(col("_h"), col("value")).limit(k)
    val other = survivors.select(col("_h").as("_h2"), col("value").as("_v2"))
    survivors.join(broadcast(other),
        col("_h2") < col("_h") ||
          (col("_h2") === col("_h") && col("_v2") < col("value")),
        "left")
      .groupBy(col("_h"), col("value"))
      .agg((count(col("_h2")) + 1L).as("rank"))
      .select(col("rank"), col("_h").as("h"), col("value"))
  }

  /** Per-GROUP [[hllRegisterCensus]] — the cardinality CUBE a pipeline
    * actually operates ("distinct users per source per day"): one
    * ≤2^b-row register census per `groupCol` value, same md5-nibble
    * determinism, same shard-merge law (engine merges per-shard
    * partials; the oracle replays one pass per group). State is
    * |groups|·2^b rows — the fixed-size answer to a question whose
    * exact form (count_distinct per group) shuffles every id at 100 TB.
    * Output: (g, register, max_rho, n_rows). */
  def hllRegisterCensusBy(
      df: DataFrame,
      groupCol: Column,
      valueCol: Column,
      shardCol: Column,
      b: Int = 8): DataFrame = {
    require(b % 4 == 0 && b >= 4 && b <= 16, s"b must be a nibble multiple in [4,16]: $b")
    val nNib = b / 4
    val base = df.select(groupCol.as("g"), shardCol.as("_s"),
      md5(valueCol.cast("string").cast("binary")).as("_h"))
    val reg = (1 to nNib).map(i =>
        s"(instr('0123456789abcdef', substring(_h, $i, 1)) - 1) * ${1 << (4 * (nNib - i))}L")
      .mkString(" + ")
    base
      .withColumn("register", expr(s"CAST($reg AS BIGINT)"))
      .withColumn("_rest", expr(s"trim(LEADING '0' FROM substring(_h, ${nNib + 1}, 16))"))
      .withColumn("rho", expr(
        """CAST(CASE WHEN _rest = '' THEN 65
          |  ELSE 4 * (16 - length(_rest))
          |     + CASE WHEN substring(_rest, 1, 1) = '1' THEN 3
          |            WHEN substring(_rest, 1, 1) IN ('2', '3') THEN 2
          |            WHEN substring(_rest, 1, 1) IN ('4', '5', '6', '7') THEN 1
          |            ELSE 0 END + 1 END AS BIGINT)""".stripMargin))
      .groupBy(col("g"), col("_s"), col("register"))
      .agg(max(col("rho")).as("_mr"), count(lit(1)).as("_n"))
      .groupBy(col("g"), col("register"))
      .agg(max(col("_mr")).as("max_rho"), sum(col("_n")).as("n_rows"))
  }

  /** KMV SET OPERATIONS — the deterministic face of theta-sketch
    * intersections: for every pair of `keyCol` groups, merge their
    * [[kmvSketch]]s into the union's bottom-k and count how many of
    * those k survivors belong to both sides. jaccard_est_ppm =
    * 10⁶·n_common DIV k_eff estimates |A∩B|/|A∪B| with k-sample
    * accuracy, and — because the sketches are md5-ordered — every
    * number here is EXACTLY reproducible in SQL: the estimator itself
    * is oracle-checked, not just bounded. The audience-overlap /
    * join-cardinality primitive at fixed state: pairwise work is
    * k-row frames per pair, never raw-id intersections
    * ([[setOpSketchCheck]] is the library-sketch sibling whose HIP
    * estimates only admit tolerance checks).
    *
    * Scale shape: one distinct pass per group (map-side combinable),
    * per-group bottom-k via partitioned rank, the pair stage touches
    * only |groups|²·k sketch rows — domain-bounded. Output per pair:
    * (key_a, key_b, k_eff, n_common, jaccard_est_ppm). */
  def kmvSetOps(
      df: DataFrame,
      keyCol: String,
      valueCol: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    import org.apache.spark.sql.expressions.Window
    val distinctKeys = df.select(col(keyCol).as("_k"), valueCol.as("_v")).distinct()
      .withColumn("_h", md5(col("_v").cast("string").cast("binary")))
    val wG = Window.partitionBy(col("_k")).orderBy(col("_h"), col("_v"))
    val sketches = distinctKeys
      .withColumn("_r", row_number().over(wG))
      .filter(col("_r") <= k)
      .select(col("_k"), col("_h"), col("_v"))
    // pairwise union of the two sketches, re-ranked; keep the union's
    // bottom-k (k_eff = min(k, |union|)) and count two-sided members
    val pairs = sketches.select(col("_k").as("key_a")).distinct()
      .crossJoin(sketches.select(col("_k").as("key_b")).distinct())
      .filter(col("key_a") < col("key_b"))
    val both = sketches.select(col("_k").as("key_a"), col("_h"), col("_v"))
      .join(sketches.select(col("_k").as("key_b"), col("_h"), col("_v")),
        Seq("_h", "_v"))
    val wP = Window.partitionBy(col("key_a"), col("key_b"))
      .orderBy(col("_h"), col("_v"))
    val merged = pairs.join(sketches.select(col("_k").as("key_a"), col("_h"), col("_v")),
        Seq("key_a"))
      .unionByName(pairs.join(
        sketches.select(col("_k").as("key_b"), col("_h"), col("_v")), Seq("key_b"))
        .select(col("key_a"), col("key_b"), col("_h"), col("_v")))
      .select(col("key_a"), col("key_b"), col("_h"), col("_v")).distinct()
      .withColumn("_r", row_number().over(wP))
      .filter(col("_r") <= k)
    merged
      .join(both.select(col("key_a"), col("key_b"), col("_h"), col("_v"),
          lit(1L).as("_c")),
        Seq("key_a", "key_b", "_h", "_v"), "left")
      .groupBy(col("key_a"), col("key_b"))
      .agg(count(lit(1)).as("k_eff"),
        sum(coalesce(col("_c"), lit(0L))).as("n_common"))
      .withColumn("jaccard_est_ppm",
        expr("CAST(n_common * 1000000 DIV k_eff AS BIGINT)"))
      .select(col("key_a"), col("key_b"), col("k_eff"),
        col("n_common"), col("jaccard_est_ppm"))
  }

  /** Per-`keyCol` quantile-sketch accuracy check: `percentile_approx`
    * (GK summary, rank error ≤ n/accuracy) at each q in `percents`, then
    * a second exact pass verifies the returned value's RANK bracket —
    * count(x < v) and count(x ≤ v) must straddle ceil(q·n) within
    * tol = max(1, ⌈n/accuracy⌉). Rank (not value) is what GK guarantees,
    * so this is the strongest check that holds for any data.
    *
    * Output: key, n_docs, p<q>_ok booleans. The approx side shuffles one
    * bounded summary per (partition, key); the verify side is one extra
    * scan joined against the broadcast 1-row-per-key sketch output —
    * cheap at any scale, and droppable in production once trusted.
    */
  def quantileSketchCheck(
      df: DataFrame,
      keyCol: String,
      valCol: String,
      percents: Seq[Int],
      accuracy: Int = 10000): DataFrame = {
    val fracs = percents.map(_ / 100.0)
    val appr = df.groupBy(col(keyCol)).agg(
      percentile_approx(col(valCol), array(fracs.map(lit): _*), lit(accuracy)).as("_ap"))
    val aggs = percents.zipWithIndex.flatMap { case (p, i) =>
      val a = col("_ap").getItem(i)
      Seq(sum(when(col(valCol) < a, 1L).otherwise(0L)).as(s"_lt_$p"),
        sum(when(col(valCol) <= a, 1L).otherwise(0L)).as(s"_le_$p"))
    }
    val g = df.join(broadcast(appr), keyCol)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_docs"), aggs: _*)
    val tol = greatest(lit(1L), ceil(col("n_docs").cast("double") / accuracy).cast("long"))
    val flags = percents.map { p =>
      val target = ceil(col("n_docs") * lit(p / 100.0)).cast("long")
      ((col(s"_lt_$p") <= target - 1 + tol) &&
        (col(s"_le_$p") >= target - tol)).as(s"p${p}_ok")
    }
    g.select(col(keyCol) +: col("n_docs") +: flags: _*)
  }

  /** Heavy-hitter frequency estimation via count-min sketch — the third
    * sketch workhorse (after HLL and quantiles): fixed
    * depth×width counter state per pass, map-side combined, answers
    * "how often does item x occur" within ε·N overcount with
    * probability ≥ confidence.
    *
    * Pins BOTH sketch contracts with machine-checked booleans:
    *  - `cms_ok`: exact ≤ estimate ≤ exact + ⌈ε·N⌉ (CMS never
    *    undercounts; overcount bounded by collisions)
    *  - `merge_exact`: a sketch merged from two disjoint splits is
    *    counter-wise IDENTICAL to the whole-built sketch (CMS merge is
    *    exact addition — unlike HLL, where union degrades the HIP
    *    estimator; see [[distinctSketchCheck]]). This is what makes
    *    per-partition/per-day sketch rollups lossless at 100 TB.
    *
    * The queried keys are the exact top-`topN` items (tie-broken by
    * item), so the output is deterministic and oracle-checkable. The
    * sketch build is one distributed aggregate; estimate queries are
    * driver-side against the ~130 KB sketch — the serving-side shape. */
  def heavyHitterSketchCheck(
      df: DataFrame,
      itemCol: String,
      splitCol: Column,
      topN: Int = 10,
      eps: Double = 0.0001,
      confidence: Double = 0.99,
      seed: Int = 42): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // the typed collect below reads (item, count) as (Long, Long) — fail
    // fast on a non-long item column instead of a runtime cast error
    // (ADVICE r5 #3)
    require(df.schema(itemCol).dataType == org.apache.spark.sql.types.LongType,
      s"heavyHitterSketchCheck requires a LongType itemCol; " +
        s"'$itemCol' is ${df.schema(itemCol).dataType.simpleString}")
    // NULL-safe split: splitCol===0 and splitCol=!=0 are both null-false,
    // so an un-coalesced null split would drop rows from BOTH halves and
    // spuriously fail merge_exact (ADVICE r5 #3)
    val split = coalesce(splitCol, lit(0))
    val top = df.groupBy(col(itemCol)).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col(itemCol))
      .limit(topN)
      .as[(Long, Long)].collect()
    val whole = df.stat.countMinSketch(itemCol, eps, confidence, seed)
    val merged = df.filter(split === 0).stat.countMinSketch(itemCol, eps, confidence, seed)
    merged.mergeInPlace(df.filter(split =!= 0).stat.countMinSketch(itemCol, eps, confidence, seed))
    val bound = math.max(1L, math.ceil(eps * whole.totalCount).toLong)
    val rows = top.toSeq.map { case (item, exact) =>
      val est = whole.estimateCount(item)
      (item, exact, est >= exact && est <= exact + bound, merged.estimateCount(item) == est)
    }
    spark.createDataset(rows).toDF(itemCol, "n_exact", "cms_ok", "merge_exact")
  }

  /** Sketch SET OPERATIONS: estimate the distinct-id INTERSECTION of
    * every unordered pair of `keyCol` groups by inclusion–exclusion over
    * Datasketches HLL (|A∩B| ≈ est(A) + est(B) − est(A ⊎ B)) — the
    * audience-overlap / cross-segment-reach primitive at 100 TB, where
    * the per-group sketch is a few KB and the pairwise combine touches
    * only the groups-row frame, never the raw ids.
    *
    * Error compounds across THREE estimates, each relative to its own
    * set (not the intersection), so the honest machine-checked contract
    * bounds the error against the UNION size: |est∩ − exact∩| ≤
    * tolFrac·|A∪B| (+1 absolute floor). Sketches are deterministic, so
    * the boolean reproduces. Exact |A∩B| rides the same single id-keyed
    * shuffle: each id's key-set explodes row-locally into its ≤C(k,2)
    * key pairs; |A∪B| = nA + nB − n∩ costs nothing.
    *
    * Output per pair (key_a < key_b): (key_a, key_b, n_a, n_b, n_union,
    * n_inter, incl_excl_ok). */
  def setOpSketchCheck(
      df: DataFrame,
      keyCol: String,
      idCol: String,
      tolFrac: Double = 0.15,
      lgConfigK: Int = 12): DataFrame = {
    // ONE data-sized shuffle: per-id key SETS (map-side-combined object
    // agg). A naive `distinct()` formulation shuffles the raw pair frame
    // up to THREE times (distinct feeding the sketch agg, plus both
    // sides of an id-keyed intersection self-join; exchange reuse does
    // not survive AQE across the branches) — measured 2× the bytes of
    // this plan at 5× sf0.1. Everything below `g` is domain-bounded:
    // the exploded (key, id) frame is the deduped pair set, and the
    // per-id key-pair explode is ≤ C(|keys|, 2) rows per id.
    val ts = array_sort(col("_ts"))
    val g = df.groupBy(col(idCol).as("_u"))
      .agg(collect_set(col(keyCol)).as("_ts"))
      .select(col("_u"), ts.as("_ts"))
    val ex = g.select(col("_u"), explode(col("_ts")).as("_t"))
    val per = ex.groupBy(col("_t"))
      .agg(count(lit(1)).as("_n"), hll_sketch_agg(col("_u"), lit(lgConfigK)).as("_sk"))
    val pairs = per.select(col("_t").as("key_a"), col("_n").as("n_a"), col("_sk").as("_ska"))
      .crossJoin(per.select(col("_t").as("key_b"), col("_n").as("n_b"), col("_sk").as("_skb")))
      .filter(col("key_a") < col("key_b"))
    val pairArr = flatten(transform(col("_ts"), (x, i) =>
      transform(slice(col("_ts"), i + lit(2), size(col("_ts"))),
        y => struct(x.as("key_a"), y.as("key_b")))))
    val inter = g.select(explode(pairArr).as("_p"))
      .groupBy(col("_p.key_a"), col("_p.key_b"))
      .agg(count(lit(1)).as("n_inter"))
    pairs.join(inter, Seq("key_a", "key_b"), "left")
      .withColumn("n_inter", coalesce(col("n_inter"), lit(0L)))
      .withColumn("n_union", col("n_a") + col("n_b") - col("n_inter"))
      .withColumn("_est_inter",
        hll_sketch_estimate(col("_ska")) + hll_sketch_estimate(col("_skb")) -
          hll_sketch_estimate(hll_union(col("_ska"), col("_skb"))))
      .select(col("key_a"), col("key_b"), col("n_a"), col("n_b"),
        col("n_union"), col("n_inter"),
        (abs(col("_est_inter") - col("n_inter")) <=
          greatest(col("n_union") * tolFrac, lit(1.0))).as("incl_excl_ok"))
  }

  /** Count-min sketch REGISTER census — the frequency twin of
    * [[hllRegisterCensus]] (HLL answers "how many distinct", CMS answers
    * "about how often does key X occur" in O(depth·width) space — the
    * building block of streaming heavy-hitter and per-key rate-limit
    * state): `depth` independent md5-derived rows × `width` counters,
    * each event incrementing one counter per row. The census IS the
    * sketch state, so two engines agreeing on every register agree on
    * every possible point query — bit-determinism by construction, the
    * [[hllRegisterCensus]] oracle argument. Cost: one `explode(depth)` +
    * one (row, col) count agg, ≤ depth·width result rows.
    * Output: (row_id, col_id, n). */
  def cmsRegisterCensus(
      df: DataFrame,
      keyCol: Column,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    require(width == 256, s"width fixed at 256 (one md5 byte): $width")
    df.select(keyCol.cast("string").as("_k"))
      .withColumn("row_id", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("col_id",
        expr("CAST(conv(substring(md5(concat(row_id, ':', _k)), 1, 2), 16, 10) AS BIGINT)"))
      .groupBy(col("row_id"), col("col_id"))
      .agg(count(lit(1)).as("n"))
  }

  /** CMS point-query check — estimates (min over the key's `depth`
    * registers) against true counts for the heaviest keys, the
    * overestimate-only contract (est ≥ true always; est−true is the
    * collision noise a capacity planner sizes width against). Probe keys
    * are the top-k true-count keys (deterministic ties by key). The
    * register frame is domain-bounded (depth·width), broadcast onto the
    * k probe rows. Output: (key, n_true, n_est, overcount). */
  def cmsPointChecks(
      df: DataFrame,
      keyCol: Column,
      topK: Int,
      depth: Int = 4,
      width: Int = 256): DataFrame = {
    val regs = cmsRegisterCensus(df, keyCol, depth, width)
    val top = df.select(keyCol.cast("string").as("key"))
      .groupBy(col("key")).agg(count(lit(1)).as("n_true"))
      .orderBy(col("n_true").desc, col("key")).limit(topK)
    top
      .withColumn("row_id", explode(sequence(lit(0L), lit(depth - 1L))))
      .withColumn("col_id",
        expr("CAST(conv(substring(md5(concat(row_id, ':', key)), 1, 2), 16, 10) AS BIGINT)"))
      .join(broadcast(regs), Seq("row_id", "col_id"))
      .groupBy(col("key"), col("n_true"))
      .agg(min(col("n")).as("n_est"))
      .withColumn("overcount", col("n_est") - col("n_true"))
  }
}
