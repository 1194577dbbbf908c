package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Pure column-expression encodings used across the reference's stores —
  * all codegen-friendly built-ins, no UDFs (SURVEY.md §2.8).
  */
object Encodings {

  /** direction ∈ {1,2} → boolean (stored as `direction - 1`,
    * /root/reference/stores/apache_parquet.py:35). */
  def encodeDirection(direction: Column): Column = direction === lit(2)

  /** boolean → direction ∈ {1,2}
    * (/root/reference/stores/postgresql_python_conv.py:84). */
  def decodeDirection(b: Column): Column = when(b, lit(2)).otherwise(lit(1))

  /** md5-prefix surrogate key for dimension dedup
    * (/root/reference/stores/postgresql_velocity.py:64-67 len 8;
    * _2levels.py:77-85 len 6/3). Columns are joined with a separator so
    * ("ab","c") and ("a","bc") never collide; NULLs coalesce to "" so the
    * separator (and thus the key) is well-defined under NULL attributes.
    * An 8-hex prefix is 32 bits — birthday collisions likely past ~10^4
    * distinct tuples, so dedup must key on the full tuple (Normalize) and
    * treat this prefix as a display/storage key only. */
  def surrogateKey(len: Int, cols: Column*): Column =
    substring(md5(concat_ws("|", cols.map(c => coalesce(c.cast("string"), lit(""))): _*)), 1, len)

  /** Fixed-point delta-vs-min encode: int((x - min) * scale)
    * (/root/reference/stores/postgresql_velocity_split.py:121-122).
    * floor == Python int() for the non-negative deltas this is used on. */
  def fixedPointEncode(x: Column, minV: Column, scale: Double = 1e8): Column =
    floor((x - minV) * lit(scale)).cast(LongType)

  /** Inverse: encoded / scale + min
    * (/root/reference/stores/postgresql_velocity_split.py:177-179). */
  def fixedPointDecode(e: Column, minV: Column, scale: Double = 1e8): Column =
    e / lit(scale) + minV

  /** Hour bucket — the reference's `timestamp[:13]` filename prefix
    * (/root/reference/stores/apache_parquet.py:27,107) as a proper
    * partition-column expression. */
  def hourBucket(ts: Column): Column = date_trunc("hour", ts)
}
