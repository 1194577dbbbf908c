package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) curve over two 16-bit grid coordinates — the
  * multi-dimensional clustering key the reference approximates with its
  * Szudzik/Cantor pairing stores (/root/reference/stores/
  * apache_parquet_cantor.py:18-55: pairing gives a UNIQUE key but not a
  * locality-preserving one). Bit interleaving is monotonic per
  * coordinate: x1 ≤ x2 ∧ y1 ≤ y2 ⇒ morton(x1,y1) ≤ morton(x2,y2), so
  * every point of a bbox lies in [morton(lo), morton(hi)] — ONE range
  * predicate on the clustered key prunes partitions and parquet row
  * groups for a 2-D query (the z-curve jump gap is extra scanned rows,
  * removed by the exact bbox re-check; never missed rows).
  *
  * Everything is composed from builtin bitwise ops (shiftleft/&/|), so
  * the whole key stays inside whole-stage codegen and the identical
  * arithmetic is expressible in any SQL engine for the oracle.
  */
object ZOrder {

  /** Spread the low 16 bits of `c` to even bit positions 0,2,…,30
    * (Part1By1 with 32-bit magic masks, long arithmetic throughout). */
  def spread16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0xFFFFL))
    val b = a.bitwiseOR(shiftleft(a, 8)).bitwiseAND(lit(0x00FF00FFL))
    val d = b.bitwiseOR(shiftleft(b, 4)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftleft(d, 2)).bitwiseAND(lit(0x33333333L))
    e.bitwiseOR(shiftleft(e, 1)).bitwiseAND(lit(0x55555555L))
  }

  /** Inverse of spread16: collect even bit positions back to 16 bits. */
  def compact16(c: Column): Column = {
    val a = c.bitwiseAND(lit(0x55555555L))
    val b = a.bitwiseOR(shiftright(a, 1)).bitwiseAND(lit(0x33333333L))
    val d = b.bitwiseOR(shiftright(b, 2)).bitwiseAND(lit(0x0F0F0F0FL))
    val e = d.bitwiseOR(shiftright(d, 4)).bitwiseAND(lit(0x00FF00FFL))
    e.bitwiseOR(shiftright(e, 8)).bitwiseAND(lit(0x0000FFFFL))
  }

  /** 32-bit Morton key of two 16-bit grid coords. */
  def mortonKey(x: Column, y: Column): Column =
    spread16(x).bitwiseOR(shiftleft(spread16(y), 1))

  def mortonX(z: Column): Column = compact16(z)
  def mortonY(z: Column): Column = compact16(shiftright(z, 1))

  /** Driver-side key for literal bbox corners (plan constants). */
  def mortonKeyLong(x: Long, y: Long): Long = {
    def spread(v: Long): Long = {
      val a = v & 0xFFFFL
      val b = (a | (a << 8)) & 0x00FF00FFL
      val d = (b | (b << 4)) & 0x0F0F0F0FL
      val e = (d | (d << 2)) & 0x33333333L
      (e | (e << 1)) & 0x55555555L
    }
    spread(x) | (spread(y) << 1)
  }
}
