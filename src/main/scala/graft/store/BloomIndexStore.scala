package graft.store

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** CONSTANT-WIDTH Bloom signatures over the skip-store layout — the
  * companion of [[SkipIndexStore]] for the high-cardinality regime its
  * exact membership set cannot reach: a `collect_set(hash mod Bits)`
  * signature grows O(min(distinct, Bits)) per bucket and saturates (every
  * bit set, zero skipping) once distinct keys ≳ Bits, while a k-hash
  * Bloom bitset stays a FIXED 4 KiB per bucket with a false-positive
  * rate (1 − e^(−kn/m))^k the operator can size for — the actual
  * construction behind parquet column blooms and Delta/Iceberg file
  * skipping at 10⁹-key scale.
  *
  * Signature layout: per bucket, `BloomBits` bits packed as
  * (bucket, word, mask) BIGINT rows — Buckets × BloomBits/64 rows total,
  * assembled by one map-side-combined `bit_or` aggregation (no array
  * reassembly, no driver). k = 3 positions per key come from
  * `xxhash64(key, i)` — deterministic, engine-replayable.
  *
  * Probe path: probe keys explode to (key, word, bit) rows, broadcast
  * onto the index; a bucket is a CANDIDATE for a key iff all k bits are
  * set (count of satisfied positions = k). The surviving bucket list
  * (≤ Buckets ints — a bounded scalar set, the audited-collect class)
  * becomes a literal partition predicate: the main scan prunes skipped
  * bucket dirs at compile time, false positives cost one pruned scan
  * each, never correctness. At 100 TB: same signature per FILE beside
  * the manifest, merged bitwise on compaction (Bloom union = OR). */
object BloomIndexStore {

  /** Bloom width per bucket: 2¹⁵ bits = 512 packed longs = 4 KiB. */
  val BloomBits = 1 << 15

  /** Hash functions per key. */
  val Hashes = 3

  private def pos(k: Column, i: Int): Column =
    pmod(xxhash64(k, lit(i)), lit(BloomBits.toLong))

  /** Per-bucket packed Bloom bitset over the lookup key (event_id) of
    * the [[SkipIndexStore]] events store. */
  def ensureBloomIndex(spark: SparkSession, storePath: String): String = synchronized {
    val path = s"$storePath-bloom"
    if (!Files.exists(Paths.get(path, "_SUCCESS"))) {
      val positions = (0 until Hashes).map(i => pos(col("event_id"), i))
      spark.read.parquet(storePath)
        .select(col("fb"), explode(array(positions: _*)).as("_p"))
        .select(col("fb"), expr("_p DIV 64").as("word"),
          (col("_p") % 64L).cast("int").as("_bit"))
        .groupBy(col("fb"), col("word"))
        .agg(bit_or(expr("shiftleft(CAST(1 AS BIGINT), _bit)")).as("mask"))
        .coalesce(1)
        .write.mode("overwrite").parquet(path)
    }
    path
  }

  /** Point-set lookup through the Bloom index: candidate buckets (all k
    * bits present) → literal bucket IN-list partition pruning → exact
    * broadcast semi-join. `keys` must carry a long column `k`. */
  def bloomScan(spark: SparkSession, storePath: String, indexPath: String,
      keys: DataFrame): DataFrame = {
    val probeBits = (0 until Hashes)
      .map(i => struct(lit(i).as("i"), pos(col("k"), i).as("p")))
    val probes = keys
      .select(col("k"), explode(array(probeBits: _*)).as("_pb"))
      .select(col("k"), expr("_pb.p DIV 64").as("word"),
        (col("_pb.p") % 64L).cast("int").as("_bit"))
    val hitBuckets = spark.read.parquet(indexPath)
      .join(broadcast(probes), Seq("word"))
      .filter(expr("(mask & shiftleft(CAST(1 AS BIGINT), _bit)) != 0"))
      .groupBy(col("fb"), col("k")).agg(count(lit(1)).as("_hits"))
      .filter(col("_hits") === Hashes.toLong)
      .select(col("fb")).distinct()
      .collect().map(_.getInt(0)) // bounded: ≤ Buckets ints
    spark.read.parquet(storePath)
      .filter(col("fb").isin(hitBuckets.map(Integer.valueOf): _*))
      .join(broadcast(keys.select(col("k").as("event_id"))), Seq("event_id"), "left_semi")
  }
}
