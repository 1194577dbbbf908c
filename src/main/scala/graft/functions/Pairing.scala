package graft.functions

import java.math.BigInteger

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Decoded coordinate pair (fixed-point longs). */
final case class XY(x: Long, y: Long)

/** Cantor / Szudzik "elegant" pairing of two non-negative fixed-point
  * integers into one value, and the exact inverses — the reference's only
  * genuinely non-built-in scalar op
  * (/root/reference/stores/apache_parquet_cantor.py:18-55; usage at
  * :86-89,184-188 pairs 1e16-scaled lon/lat and stores the result as a
  * 15-byte little-endian binary).
  *
  * At the reference's 1e16 scale, pair values reach ~1e33 ≫ Long.MaxValue,
  * so all math is exact `java.math.BigInteger`. The inverse uses
  * `BigInteger.sqrt` (exact integer isqrt, Java 9+) — the reference's
  * float `math.sqrt` inverse is lossy at that magnitude
  * (apache_parquet_cantor.py:42-55); per SURVEY.md §0 we implement the
  * *intended* inverse-of-pair semantics, not the float bug.
  *
  * Scale notes: Scala UDFs (not codegen Expressions) — they sit in a
  * projection, not in a join/filter hot path; per-row cost is a few
  * BigInteger mults on 120-bit values. Inputs must be non-negative
  * (enforced by the caller's fixed-point encoding; negative input throws).
  */
object Pairing {

  val PairBytes = 15 // reference BYTES_FOR_COORDINATES (apache_parquet_cantor.py:14)

  // ---- exact integer pairing --------------------------------------------

  /** Szudzik elegant pair: x < y ? y²+x : x²+x+y
    * (apache_parquet_cantor.py:33-39). */
  def szudzikPair(x: BigInteger, y: BigInteger): BigInteger = {
    require(x.signum >= 0 && y.signum >= 0, "pairing requires non-negative inputs")
    if (x.compareTo(y) < 0) y.multiply(y).add(x)
    else x.multiply(x).add(x).add(y)
  }

  /** Exact inverse via integer sqrt (intended semantics of
    * apache_parquet_cantor.py:42-55). */
  def szudzikUnpair(z: BigInteger): (BigInteger, BigInteger) = {
    val s = z.sqrt()
    val r = z.subtract(s.multiply(s)) // z - s², in [0, 2s]
    if (r.compareTo(s) < 0) (r, s) else (s, r.subtract(s))
  }

  /** Cantor pair: (x+y)(x+y+1)/2 + y (apache_parquet_cantor.py:18-22). */
  def cantorPair(x: BigInteger, y: BigInteger): BigInteger = {
    require(x.signum >= 0 && y.signum >= 0, "pairing requires non-negative inputs")
    val s = x.add(y)
    s.multiply(s.add(BigInteger.ONE)).shiftRight(1).add(y)
  }

  /** Exact inverse: w = ⌊(√(8z+1)−1)/2⌋ by integer sqrt
    * (intended semantics of apache_parquet_cantor.py:25-30). */
  def cantorUnpair(z: BigInteger): (BigInteger, BigInteger) = {
    val w = z.shiftLeft(3).add(BigInteger.ONE).sqrt()
      .subtract(BigInteger.ONE).shiftRight(1)
    val t = w.multiply(w.add(BigInteger.ONE)).shiftRight(1)
    val y = z.subtract(t)
    (w.subtract(y), y)
  }

  // ---- fixed-width little-endian binary ---------------------------------

  /** Non-negative BigInteger → `width` bytes little-endian
    * (apache_parquet_cantor.py:89 `to_bytes(15, 'little')`). */
  def toLittleEndian(v: BigInteger, width: Int): Array[Byte] = {
    val be = v.toByteArray // big-endian, possibly leading 0x00 sign byte
    val out = new Array[Byte](width)
    var i = be.length - 1
    var j = 0
    while (i >= 0 && j < width) { out(j) = be(i); i -= 1; j += 1 }
    require(i < 0 || be.take(i + 1).forall(_ == 0), s"value does not fit in $width bytes")
    out
  }

  def fromLittleEndian(bytes: Array[Byte]): BigInteger =
    new BigInteger(1, bytes.reverse)

  // ---- Spark Column surface ---------------------------------------------
  // Native codegen Expressions (PairingExpressions.scala), not UDFs: the
  // projection stays in whole-stage codegen with a direct static call.

  import org.apache.spark.sql.graftbridge.{columnOf, expressionOf}

  def szudzikPairCol(x: Column, y: Column): Column =
    columnOf(SzudzikPair(expressionOf(x), expressionOf(y)))
  /** binary(15) → struct(x: Long, y: Long) */
  def szudzikUnpairCol(b: Column): Column = columnOf(SzudzikUnpair(expressionOf(b)))
  def cantorPairCol(x: Column, y: Column): Column =
    columnOf(CantorPair(expressionOf(x), expressionOf(y)))
  def cantorUnpairCol(b: Column): Column = columnOf(CantorUnpair(expressionOf(b)))

  // UDF reference implementations (kept for differential testing)
  val szudzikPairUdf = udf { (x: Long, y: Long) =>
    toLittleEndian(szudzikPair(BigInteger.valueOf(x), BigInteger.valueOf(y)), PairBytes)
  }
  val szudzikUnpairUdf = udf { (b: Array[Byte]) =>
    val (x, y) = szudzikUnpair(fromLittleEndian(b))
    XY(x.longValueExact(), y.longValueExact())
  }
}
