package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dimension/fact normalization: surrogate-key dim extraction, anti-join
  * dedup, and snowflake reassembly (the PostgreSQL "velocity" family,
  * /root/reference/stores/postgresql_velocity.py:64-141,
  * postgresql_velocity_2levels.py:120-196).
  *
  * Scale notes: dims are tiny relative to facts (that is the whole point of
  * the normalization), so every reassembly join is an explicit broadcast —
  * no shuffle of the fact side, and the plan survives a 100× fact scale-up
  * unchanged. Dedup of incoming dims against stored dims is a left_anti
  * join on the surrogate key (the reference's per-batch
  * `WHERE hash IN (...)` + set-difference round-trip collapsed into one
  * distributed op).
  */
object Normalize {

  /** Extract the distinct dimension rows of `cols`, keyed by an md5-prefix
    * surrogate hash (/root/reference/stores/postgresql_velocity.py:64-67).
    * Dedup is on the FULL tuple, not the truncated hash — a 32-bit prefix
    * collision must never silently drop a distinct dim row at scale. */
  def extractDim(df: DataFrame, hashLen: Int, cols: Seq[String], hashCol: String = "dim_hash"): DataFrame =
    df.select(Encodings.surrogateKey(hashLen, cols.map(col): _*).as(hashCol) +: cols.map(col): _*)
      .dropDuplicates(cols)

  /** Fact table re-keyed onto the dim: original cols replaced by the
    * surrogate hash. */
  def factWithKey(df: DataFrame, hashLen: Int, cols: Seq[String], hashCol: String = "dim_hash"): DataFrame =
    df.withColumn(hashCol, Encodings.surrogateKey(hashLen, cols.map(col): _*))
      .drop(cols: _*)

  /** Dim rows not yet present in `existing` — the incremental dim upsert's
    * read side (/root/reference/stores/postgresql_velocity.py:98-113).
    * Key on the FULL dim tuple where possible — a truncated-hash key
    * silently drops colliding dims (same bound as extractDim). */
  def newDims(incoming: DataFrame, existing: DataFrame, keyCols: Seq[String]): DataFrame =
    incoming.join(existing.select(keyCols.map(col): _*), keyCols, "left_anti")

  def newDims(incoming: DataFrame, existing: DataFrame, keyCol: String): DataFrame =
    newDims(incoming, existing, Seq(keyCol))

  /** Snowflake reassembly: chained broadcast joins fact ⋈ dim₁ ⋈ dim₂ ⋈ …
    * (/root/reference/stores/postgresql_velocity_2levels.py:155-196). */
  def reassemble(fact: DataFrame, dims: Seq[(DataFrame, String)]): DataFrame =
    dims.foldLeft(fact) { case (acc, (dim, key)) =>
      acc.join(broadcast(dim), Seq(key), "inner")
    }
}
