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
}
