package graft

import java.math.BigInteger

import org.scalacheck.{Gen, Prop, Properties}
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Pairing

/** Round-trip properties for the Szudzik/Cantor pairing (SURVEY.md §5.1):
  * exact inverses at the reference's 1e16 coordinate scale
  * (apache_parquet_cantor.py:13-15 — Brussels bbox lon ~4.x, lat ~50.x
  * scaled to ~5e16), where pair values reach ~1e33 and any float sqrt
  * inverse would be lossy. */
object PairingProps extends Properties("Pairing") {

  // Brussels-ish bbox at the reference's PRECISION=1e16 scale
  private val lonScaled = Gen.choose(40000000000000000L, 46000000000000000L)
  private val latScaled = Gen.choose(505000000000000000L, 509000000000000000L)
  private val anyNonNeg = Gen.choose(0L, Long.MaxValue)

  property("szudzik roundtrip @1e16 scale") = Prop.forAll(lonScaled, latScaled) { (x, y) =>
    val (rx, ry) = Pairing.szudzikUnpair(
      Pairing.szudzikPair(BigInteger.valueOf(x), BigInteger.valueOf(y)))
    rx.longValueExact() == x && ry.longValueExact() == y
  }

  property("cantor roundtrip @1e16 scale") = Prop.forAll(lonScaled, latScaled) { (x, y) =>
    val (rx, ry) = Pairing.cantorUnpair(
      Pairing.cantorPair(BigInteger.valueOf(x), BigInteger.valueOf(y)))
    rx.longValueExact() == x && ry.longValueExact() == y
  }

  property("szudzik roundtrip on arbitrary non-negative longs") =
    Prop.forAll(anyNonNeg, anyNonNeg) { (x, y) =>
      val (rx, ry) = Pairing.szudzikUnpair(
        Pairing.szudzikPair(BigInteger.valueOf(x), BigInteger.valueOf(y)))
      rx.longValueExact() == x && ry.longValueExact() == y
    }

  property("little-endian 15-byte roundtrip") = Prop.forAll(lonScaled, latScaled) { (x, y) =>
    val z = Pairing.szudzikPair(BigInteger.valueOf(x), BigInteger.valueOf(y))
    val bytes = Pairing.toLittleEndian(z, Pairing.PairBytes)
    bytes.length == 15 && Pairing.fromLittleEndian(bytes) == z
  }
}

class PairingSpec extends AnyFunSuite {

  test("pair values at 1e16 scale genuinely exceed Long (need BigInteger)") {
    val z = Pairing.szudzikPair(
      BigInteger.valueOf(46000000000000000L), BigInteger.valueOf(509000000000000000L))
    assert(z.bitLength > 63)
  }

  test("known Szudzik values (x<y and x>=y branches)") {
    def sz(x: Long, y: Long): Long =
      Pairing.szudzikPair(BigInteger.valueOf(x), BigInteger.valueOf(y)).longValueExact()
    assert(sz(1, 2) == 5) // x<y: y²+x
    assert(sz(2, 1) == 7) // x>=y: x²+x+y
    assert(sz(0, 0) == 0)
  }

  test("known Cantor values") {
    def ca(x: Long, y: Long): Long =
      Pairing.cantorPair(BigInteger.valueOf(x), BigInteger.valueOf(y)).longValueExact()
    assert(ca(0, 0) == 0)
    assert(ca(1, 0) == 1) // (x+y)(x+y+1)/2 + y
    assert(ca(0, 1) == 2)
    assert(ca(2, 0) == 3)
  }

  test("negative input is rejected") {
    intercept[IllegalArgumentException] {
      Pairing.szudzikPair(BigInteger.valueOf(-1), BigInteger.ONE)
    }
    intercept[IllegalArgumentException] {
      Pairing.cantorPair(BigInteger.ONE, BigInteger.valueOf(-1))
    }
  }

}
