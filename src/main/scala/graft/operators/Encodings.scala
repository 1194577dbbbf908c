package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** ORDER-PRESERVING global string dictionary: every distinct string
    * gets a dense code 1..D with code order == lexicographic order —
    * the layout/compression encode that turns string sort/range/join
    * keys into longs ([[surrogateKey]] is the hash face: stable but
    * order-DESTROYING; this is the face range predicates survive, so
    * `dict_lo <= code <= dict_hi` prunes like the string zone map).
    *
    * NO unpartitioned window anywhere: the distinct census
    * `repartitionByRange`s over the string itself (range-sampled,
    * order-CONTIGUOUS partitions — the sampler only shapes the PLAN;
    * codes depend on values alone), per-partition counts come back as
    * ≤ nBands longs (the AQE-stats shape) and broadcast as exclusive
    * offsets, and the in-partition rank is a partition-local window.
    * The census pass is the only data-sized stage; D-row output.
    *
    * Output: (code, value), code 1..D dense, ordered by value. */
  def dictEncode(df: DataFrame, strCol: Column, nBands: Int = 32): DataFrame = {
    require(nBands >= 1, s"nBands must be >= 1: $nBands")
    val spark = df.sparkSession
    import spark.implicits._
    val census = df.select(strCol.cast("string").as("value"))
      .filter(col("value").isNotNull).distinct()
    // STAGE the range-partitioned census: repartitionByRange re-SAMPLES
    // its boundaries on every job, so the offsets collect and the final
    // rank join would otherwise see different partitionings (observed:
    // rank shifts at sf0.1). One materialization pins the _pid column
    // for both consumers — and a dictionary build persists its census
    // in production anyway (it IS the stored artifact).
    val parts = graft.store.Staging.stage(
      census.repartitionByRange(nBands, col("value"))
        .withColumn("_pid", spark_partition_id()),
      "dict_census")
    val counts = parts.groupBy(col("_pid")).agg(count(lit(1)).as("_c"))
      .as[(Int, Long)].collect().sortBy(_._1) // ≤ nBands rows
    val offDf = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1))
      .toSeq.toDF("_pid", "_off")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("_pid")).orderBy(col("value"))
    parts.join(broadcast(offDf), Seq("_pid"))
      .withColumn("code", (col("_off") + row_number().over(w)).cast("long"))
      .select(col("code"), col("value"))
  }
}
