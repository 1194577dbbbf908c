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

  /** Salted shuffle equi-join for a SKEWED fact key against a dim too big
    * to broadcast: the fact side gets a deterministic salt in [0, salts)
    * derived from `saltSrc` (a high-cardinality fact column — never a
    * RNG, so re-runs and retried tasks salt identically), the dim side
    * replicates each row `salts` times, and the join runs on (key, salt)
    * — a hot key's rows land on `salts` different reducers instead of
    * one. Join semantics are untouched (every fact row still meets every
    * matching dim row exactly once); cost is the dim replication, which
    * is why `salts` stays small and the technique targets the skewed-
    * fact/large-dim corner that AQE's skew split and broadcast both
    * miss. The `shuffle_hash` hint keeps Spark from planning the very
    * broadcast this operator exists to avoid (callers demoing at dim
    * sizes a real cluster could not broadcast). */
  def saltedEquiJoin(
      fact: DataFrame,
      dim: DataFrame,
      keyCol: String,
      saltSrc: org.apache.spark.sql.Column,
      salts: Int): DataFrame = {
    require(salts >= 1, s"salts must be >= 1: $salts")
    val saltedFact = fact.withColumn("_salt", pmod(saltSrc, lit(salts)).cast("int"))
    // generators cannot nest inside expressions — explode stands alone
    // and sequence(int, int) already yields ints matching the fact salt
    val expDim = dim
      .withColumn("_salt", explode(sequence(lit(0), lit(salts - 1))))
      .hint("shuffle_hash")
    saltedFact.join(expDim, Seq(keyCol, "_salt")).drop("_salt")
  }

  /** ONE-SCAN table profile — the ANALYZE-TABLE census a lakehouse runs
    * before planning ingest or choosing layout keys: per column, the
    * row/null/exact-NDV counts, from a SINGLE pass over the data
    * (`stack` unpivots to (column, value) rows; C per-column scans would
    * read the table C times). Values are CAST to string for the common
    * unpivot type — injective for every atomic type, so the distinct
    * counts are exact, and no value is EMITTED (dtype-safe compare).
    * Shuffle after the map-side partial dedup carries distinct
    * (column, value) pairs, the same payload C separate count_distincts
    * would move — the saving is strictly the C−1 avoided scans.
    * Output: (column_name, n_rows, n_null, n_distinct). */
  def profileTable(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileTable needs at least one column")
    // names are interpolated into SQL as 'literal' + `identifier`:
    // escape both quote kinds so a hostile column name cannot break the
    // parse or mislabel a census row (ADVICE r10)
    def lit_(c: String) = c.replace("\\", "\\\\").replace("'", "\\'")
    def ident(c: String) = c.replace("`", "``")
    val stackExpr = s"stack(${cols.size}, " +
      cols.map(c => s"'${lit_(c)}', CAST(`${ident(c)}` AS STRING)").mkString(", ") +
      ") AS (column_name, _v)"
    df.select(expr(stackExpr))
      .groupBy(col("column_name"))
      .agg(count(lit(1)).as("n_rows"),
        (count(lit(1)) - count(col("_v"))).as("n_null"),
        count_distinct(col("_v")).as("n_distinct"))
  }
}
