package graft.store

import org.apache.spark.sql.DataFrame

import graft.operators.Normalize

/** MERGE-semantics upsert over plain parquet (delta-spark is not on the
  * offline classpath, so the Delta-store contract —
  * /root/reference/stores/delta_lake.py:31-40 append + filtered read, and
  * the dim upsert of /root/reference/stores/postgresql_velocity.py:98-113 —
  * is expressed as left_anti + union + atomic overwrite).
  *
  * Scale notes: insert-only upsert shuffles only on the surrogate key of
  * the *incoming* slice (existing side streams through the anti-join);
  * with AQE the anti-join broadcasts whichever side is small. The write is
  * an overwrite of the dim table only — dims are orders of magnitude
  * smaller than facts (that is the point of normalization), so rewriting
  * them wholesale is cheap at any fact scale.
  */
object MergeStore {

  /** WHEN NOT MATCHED THEN INSERT: existing rows win, unseen-key incoming
    * rows are appended (the reference dim registry's first-seen rule,
    * postgresql_velocity.py:104-106). Key on the full natural tuple, not
    * a truncated surrogate hash — hash collisions must not drop dims. */
  def upsertInsertOnly(existing: DataFrame, incoming: DataFrame, keyCols: Seq[String]): DataFrame =
    existing.unionByName(Normalize.newDims(incoming, existing, keyCols))

  def upsertInsertOnly(existing: DataFrame, incoming: DataFrame, keyCol: String): DataFrame =
    upsertInsertOnly(existing, incoming, Seq(keyCol))

  /** WHEN MATCHED THEN UPDATE ∪ WHEN NOT MATCHED THEN INSERT: incoming
    * rows replace same-key existing rows (SCD-0 overwrite). */
  def upsertReplace(existing: DataFrame, incoming: DataFrame, keyCols: Seq[String]): DataFrame =
    incoming.unionByName(Normalize.newDims(existing, incoming, keyCols))

  def upsertReplace(existing: DataFrame, incoming: DataFrame, keyCol: String): DataFrame =
    upsertReplace(existing, incoming, Seq(keyCol))

  /** Persist an upserted dim table (atomic via parquet overwrite commit
    * protocol: _temporary staging + rename, then _SUCCESS). */
  def writeDim(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Append one commit to a MERGE-ON-READ versioned log — the Delta/Hudi
    * time-travel contract (`VERSION AS OF`) over plain parquet, the
    * scale-correct inverse of [[writeDim]]'s copy-on-write overwrite: a
    * commit writes ONLY its own (op, key, payload) rows into a
    * `commit_v=<version>` PARTITION directory (no underscore prefix — Hadoop listings hide `_`-prefixed paths), never rewriting history. `df`
    * must carry an `_op` column ('U' upsert / 'D' delete) and at most
    * one row per key per commit (last-writer-wins needs a writer order
    * WITHIN the commit too — enforce upstream, the log does not
    * deduplicate). */
  def writeCommit(df: DataFrame, path: String, commitVersion: Int): Unit = {
    import org.apache.spark.sql.functions.lit
    require(commitVersion >= 0, s"version must be >= 0: $commitVersion")
    df.withColumn("commit_v", lit(commitVersion))
      .write.mode("append").partitionBy("commit_v").parquet(path)
  }

  /** Reconstruct the table state `VERSION AS OF asOf` by last-writer-wins
    * replay of commits ≤ asOf. Because `commit_v` is a PARTITION column, the
    * as-of filter prunes every newer commit AT THE SCAN
    * (`PartitionFilters: commit_v <= asOf`) — time travel reads only the
    * history it needs, and a full-history table pays nothing for old
    * versions it skips. One key-hash Exchange carries the rank-1 window
    * (WindowGroupLimit pushes the rank filter map-side); deleted keys
    * drop after the winner is chosen, so a delete tombstone correctly
    * shadows older upserts. */
  def readAsOf(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      asOf: Int,
      keyCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    val log = spark.read.parquet(path).filter(col("commit_v") <= asOf)
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col("commit_v").desc)
    log.withColumn("_rn", row_number().over(w))
      .filter(col("_rn") === 1 && col("_op") =!= "D")
      .drop("_rn", "commit_v", "_op")
  }

  /** Checkpoint-and-vacuum for the [[writeCommit]] log — the Delta
    * OPTIMIZE + VACUUM contract: materialize the reconstructed state
    * `VERSION AS OF upTo` as ONE compacted commit directory replacing
    * every commit ≤ upTo. Reads at asOf ≥ upTo are bit-identical before
    * and after (the checkpoint row set IS the replay result); history
    * BELOW the checkpoint is gone — readAsOf(asOf < upTo) afterwards
    * sees no commits, exactly Delta's post-VACUUM time-travel horizon.
    *
    * Why it matters at scale: an as-of read replays every surviving
    * commit dir; an unbounded log makes the rank-1 window read O(total
    * history). Periodic checkpoints bound the replay depth to
    * (1 checkpoint + commits since), which is the production cadence.
    * The swap is staged AND ordered for crash safety: (1) write the
    * reconstructed state to a `<path>_ckpt_tmp` dir outside the log
    * path (invisible to readers); (2) delete only the existing
    * `commit_v=upTo` dir; (3) rename the staging dir in — the
    * checkpoint now exists; (4) only then delete the older commit dirs.
    * A crash before (2) loses nothing; after (3) the checkpoint itself
    * serves every read; the only exposed window is between (2) and (3)
    * — two filesystem metadata ops — and even there no state is LOST:
    * the staging dir still holds the complete reconstructed rows
    * (recovery = finish the rename), unlike the previous ordering
    * where all commits ≤ upTo were deleted before the rename and a
    * crash stranded the whole history in the staging dir. */
  def checkpointAndVacuum(
      spark: org.apache.spark.sql.SparkSession,
      path: String,
      upTo: Int,
      keyCols: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.lit
    require(upTo >= 0, s"upTo must be >= 0: $upTo")
    val state = readAsOf(spark, path, upTo, keyCols).withColumn("_op", lit("U"))
    val tmp = path + "_ckpt_tmp"
    state.write.mode("overwrite").parquet(tmp)
    val older = new java.io.File(path).listFiles.toSeq
      .filter(f => f.isDirectory && f.getName.startsWith("commit_v="))
      .filter(f => f.getName.stripPrefix("commit_v=").toInt < upTo)
    val target = new java.io.File(path, s"commit_v=$upTo")
    if (target.exists()) SnapshotStore.deleteRecursively(target)
    require(new java.io.File(tmp).renameTo(target),
      s"checkpoint rename failed: $tmp -> $target")
    older.foreach(SnapshotStore.deleteRecursively)
    // the staged dir's _SUCCESS/_metadata ride along harmlessly inside
    // the partition dir (hidden `_` files are skipped by readers).
    // The deletes/renames above bypassed Spark's session-shared
    // FileStatusCache — drop its listings so a later readAsOf in the
    // same session can't see deleted part files.
    spark.catalog.refreshByPath(path)
  }

  /** CDC between two snapshots of a keyed table: one row per changed key
    * with op ∈ I (new key), U (same key, different compared value), D
    * (key gone) — the change feed a downstream MERGE or audit consumes
    * when the store itself keeps no transaction log (plain parquet).
    *
    * Change detection hashes the compared columns through the same
    * `md5(concat-with-|-sentinels)` rendering the dim surrogate keys use
    * — engine-reproducible for int/string columns (callers pre-floor
    * doubles), NULL-safe via the coalesce sentinel. One full-outer
    * shuffle on the key; unchanged keys drop out before any downstream
    * consumer sees them, so the feed is |changes|-sized, not
    * |snapshot|-sized. */
  def snapshotDiff(
      oldDf: DataFrame,
      newDf: DataFrame,
      keyCols: Seq[String],
      cmpCols: Seq[String]): DataFrame = {
    import org.apache.spark.sql.functions._
    def rowHash(df: DataFrame, as: String) = df.select(
      keyCols.map(col) :+
        md5(concat_ws("|", cmpCols.map(c => coalesce(col(c).cast("string"), lit(""))): _*))
          .as(as): _*)
    rowHash(oldDf, "_oh")
      .join(rowHash(newDf, "_nh"), keyCols, "full_outer")
      .select(keyCols.map(col) :+
        when(col("_oh").isNull, "I")
          .when(col("_nh").isNull, "D")
          .when(col("_oh") =!= col("_nh"), "U").as("op"): _*)
      .filter(col("op").isNotNull)
  }
}
