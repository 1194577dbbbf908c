package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Snapshot-major ↔ trajectory-major pivot and temporal lookups — the
  * reference's core data-processing capability (SURVEY.md §1.1, §1.5).
  *
  * Temporal types (MobilityDB tgeompoint/tfloat/...,
  * /root/reference/stores/mobility_db.py:44-56) are modeled as time-sorted
  * `Array[Struct(t: Timestamp, v: T)]` columns.
  *
  * Scale notes:
  *  - pivot = ONE shuffle on the entity key with map-side partial
  *    collect_list; at 100 TB this is the unavoidable re-keying from
  *    time-partitioned to entity-keyed layout. Pre-bucketing the flat table
  *    by the entity key makes repeated pivots shuffle-free.
  *  - asOfSlice/contains use higher-order array functions on the already
  *    pivoted row: zero shuffle, whole-stage codegen.
  *  - asOfJoin on the flat table is a window (single shuffle on the key),
  *    never an explode of trajectories.
  */
object Trajectory {

  /** Pivot flat observations into one row per entity with a sorted
    * Instant-array per value column
    * (/root/reference/stores/mobility_db_batch.py:80-99,
    * /root/reference/stores/postgresql_compressed_snappy.py:71-91). */
  def pivot(flat: DataFrame, keyCol: String, tsCol: String, valueCols: Seq[String]): DataFrame = {
    val aggs = valueCols.map { v =>
      sort_array(collect_list(struct(col(tsCol).as("t"), col(v).as("v")))).as(s"${v}_traj")
    }
    flat.groupBy(col(keyCol)).agg(aggs.head, aggs.tail: _*)
  }

  /** Skew-safe two-phase pivot: `pivot` builds each entity's whole array
    * in ONE reduce task's collect_list, so a hot entity (a vehicle
    * emitting 100M observations) concentrates its trajectory in a single
    * task. Phase 1 collects partial arrays per (key, salt-of-ts) —
    * bounding any task's array to ~1/saltBuckets of the key's rows and
    * distributing struct construction; phase 2 concatenates the partials
    * and sorts once. Output ≡ pivot (same lexicographic (t, v) order);
    * equivalence property-tested in TrajectorySpec. Same pattern as
    * Flatten.nestSalted. */
  def pivotSalted(flat: DataFrame, keyCol: String, tsCol: String,
      valueCols: Seq[String], saltBuckets: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(col(tsCol)), lit(saltBuckets))
    val partialAggs = valueCols.map { v =>
      collect_list(struct(col(tsCol).as("t"), col(v).as("v"))).as(s"_p_$v")
    }
    val finalAggs = valueCols.map { v =>
      sort_array(flatten(collect_list(col(s"_p_$v")))).as(s"${v}_traj")
    }
    flat.groupBy(col(keyCol), salt.as("_salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(keyCol))
      .agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Inverse pivot: trajectory rows → flat (t, key, v) observations. This is
    * the *intended* trajectory→snapshot direction the reference's batch
    * stores leave broken (SURVEY.md §0 honesty note); store 21 implements it
    * correctly per-instant (/root/reference/stores/mobility_db.py:97-136). */
  def unpivot(traj: DataFrame, keyCol: String, trajCol: String): DataFrame =
    traj
      .select(col(keyCol), explode(col(trajCol)).as("i"))
      .select(col(keyCol), col("i.t").as("t"), col("i.v").as("v"))

  /** Last instant at-or-before `t` in a sorted trajectory column — MobilityDB
    * `atTimestamp`/`getValue` generalized to as-of semantics
    * (/root/reference/stores/mobility_db.py:104-109). Null if the trajectory
    * starts after `t` (try_element_at: ANSI mode would throw on the empty
    * filter result). Shuffle-free. */
  def asOfSlice(trajCol: Column, t: Column): Column =
    try_element_at(filter(trajCol, x => x.getField("t") <= t), lit(-1))

  /** Exact-instant slice (strict MobilityDB atTimestamp); null on miss. */
  def atInstant(trajCol: Column, t: Column): Column =
    try_element_at(filter(trajCol, x => x.getField("t") === t), lit(1))

  /** Does the trajectory's validity span cover t? (tsrange `@>`,
    * /root/reference/stores/mobility_db.py:111). */
  def contains(trajCol: Column, t: Column): Column =
    element_at(trajCol, 1).getField("t") <= t &&
      t <= element_at(trajCol, -1).getField("t")

  /** As-of lookup on the FLAT table: per key, the latest row with
    * tsCol <= t. One shuffle (window on key). `tieCols` deterministically
    * break duplicate-timestamp ties (ADVICE r1). */
  def asOfJoin(flat: DataFrame, keyCol: String, tsCol: String, t: Column,
      tieCols: Seq[String] = Nil): DataFrame = {
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(tsCol).desc +: tieCols.map(col(_).desc): _*)
    flat
      .filter(col(tsCol) <= t)
      .withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1)
      .drop("_rn")
  }

  /** Validity range per entity (tsrange column,
    * /root/reference/stores/mobility_db_batch.py:81-82,107). */
  def validityRange(flat: DataFrame, keyCol: String, tsCol: String): DataFrame =
    flat.groupBy(col(keyCol))
      .agg(struct(min(col(tsCol)).as("lo"), max(col(tsCol)).as("hi")).as("validity"))

  /** NEAREST-in-time join: for each probe row, the single build row of
    * the SAME key whose timestamp is closest in EITHER direction within
    * tolerance `wUs` — the two-sided companion of [[asOfJoin]] (as-of
    * answers "state at t"; nearest answers "the matching reading",
    * sensor alignment / GPS-fix pairing, where the best match may come
    * shortly AFTER). Exact by the 1-D bin argument: with bin = wUs, any
    * build row within wUs of a probe sits in the probe's bin or an
    * adjacent one, so the 3-bin explode loses nothing; the winner is a
    * map-side-combinable min of (|Δt|, ts, id) — deterministic ties
    * (earlier row wins an equidistant pair). Probes with no build row in
    * range are dropped (left-join the result back for misses).
    *
    * Scale shape: candidates = 3 · per-(key, bin) occupancy per probe —
    * a hot key spreads over its time bins instead of one reducer (the
    * q_range_join_binned precedent); no per-key quadratic product, no
    * window over a whole key. Inputs carry (key, ts µs, id). Output:
    * (key, probe_id, probe_ts_us, match_id, dt_us signed build − probe). */
  def nearestTimeJoin(
      probes: DataFrame,
      build: DataFrame,
      keyCol: String,
      tsCol: String,
      idCol: String,
      wUs: Long): DataFrame = {
    require(wUs > 0, s"tolerance must be positive: $wUs")
    val b = build.select(col(keyCol).as("_k"),
      col(tsCol).as("_bts"), col(idCol).as("_bid"),
      call_function("div", col(tsCol) - pmod(col(tsCol), lit(wUs)), lit(wUs)).as("_bin"))
    val p = probes.select(col(keyCol).as("_k"),
        col(tsCol).as("_pts"), col(idCol).as("_pid"),
        call_function("div", col(tsCol) - pmod(col(tsCol), lit(wUs)), lit(wUs)).as("_b0"))
      .select(col("_k"), col("_pts"), col("_pid"),
        explode(array(col("_b0") - 1L, col("_b0"), col("_b0") + 1L)).as("_bin"))
    p.join(b, Seq("_k", "_bin"))
      .filter(abs(col("_bts") - col("_pts")) <= wUs)
      .groupBy(col("_k"), col("_pid"), col("_pts"))
      .agg(min(struct(abs(col("_bts") - col("_pts")).as("adt"),
        col("_bts").as("bts"), col("_bid").as("bid"))).as("_m"))
      .select(col("_k").as(keyCol), col("_pid").as("probe_id"),
        col("_pts").as("probe_ts_us"), col("_m.bid").as("match_id"),
        (col("_m.bts") - col("_pts")).as("dt_us"))
  }
}
