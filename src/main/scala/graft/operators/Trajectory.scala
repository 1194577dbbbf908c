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
}
