package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-sample preparation over token sequences: fixed-size chunking
  * with overlap, greedy sequence packing into context-window bins, and a
  * deterministic global shuffle order.
  *
  * All three are pure functions of (doc_id, token stream) — no RNG, no
  * timestamps — so a re-run over the same corpus reproduces byte-identical
  * training manifests on any engine and any cluster size.
  */
object Chunking {

  /** Overlapping fixed-size token windows — the standard LM sample prep
    * (window `size` tokens, step `stride` < size ⇒ `size - stride` tokens
    * of overlap carry context across chunk boundaries). One chunk starts
    * at every multiple of `stride` below the token count, so the final
    * chunks may be short (kept: downstream packing handles ragged tails).
    *
    * Scale: purely row-local (split + sequence-explode + slice are all
    * codegen'd projections) — chunking 100 TB shuffles nothing.
    *
    * NULL or token-less text is represented explicitly as ONE
    * (start_pos 0, n_tok 0, chunk_text "") row — no document silently
    * vanishes from the sample manifest, and the sequence() bound is
    * guarded so an empty token array cannot throw (ADVICE r5 #2).
    */
  def chunkTokens(docs: DataFrame, textCol: String, size: Int, stride: Int): DataFrame = {
    require(size > 0 && stride > 0 && stride <= size,
      s"need 0 < stride ($stride) <= size ($size)")
    docs
      .select(col("doc_id"),
        coalesce(TextAnalysis.tokens(col(textCol)),
          array().cast("array<string>")).as("_toks"))
      .select(col("doc_id"), col("_toks"),
        explode(sequence(lit(0),
          greatest(org.apache.spark.sql.functions.size(col("_toks")) - 1, lit(0)),
          lit(stride))).as("start_pos"))
      .select(
        col("doc_id"),
        col("start_pos").cast("long"),
        slice(col("_toks"), col("start_pos") + 1, lit(size)).as("_chunk"))
      .select(
        col("doc_id"),
        col("start_pos"),
        org.apache.spark.sql.functions.size(col("_chunk")).cast("long").as("n_tok"),
        concat_ws(" ", col("_chunk")).as("chunk_text"))
  }

  /** Greedy sequence packing: assign docs to context-window "bins" of
    * `capacity` tokens, filling each bin in doc_id order and starting a
    * new one when the next doc would overflow (a doc longer than
    * `capacity` gets a bin of its own). Packing is sequential by nature,
    * so it runs independently per hash shard (`nibble(doc_id)`, 16
    * shards): only (doc_id, n_tok) metadata shuffles — never text — and
    * each shard's pack is a single sorted pass inside its partition.
    * Emits (shard, bin_id, doc_id, n_tok, tok_offset) — the manifest a
    * packed-batch loader consumes.
    *
    * Scale: at 100 TB the per-shard metadata stream is ~rows/16 of
    * (long, long) pairs; widen to 256+ shards by using more nibbles. The
    * sequential scan is mapPartitions over shard-sorted partitions —
    * no driver collect, no window over a single global partition.
    */
  def greedyPack(docs: DataFrame, textCol: String, capacity: Int): DataFrame = {
    require(capacity > 0, s"capacity must be positive: $capacity")
    val spark = docs.sparkSession
    import spark.implicits._
    val meta = docs.select(
        col("doc_id").cast("long"),
        Sampling.hashNibble(col("doc_id")).cast("int").as("shard"),
        TextAnalysis.tokenCount(TextAnalysis.tokens(col(textCol))).as("n_tok"))
      .repartition(col("shard"))
      .sortWithinPartitions(col("shard"), col("doc_id"))
    meta.select(col("shard"), col("doc_id"), col("n_tok")).as[(Int, Long, Long)]
      .mapPartitions { it =>
        var curShard = -1
        var bin = 0L
        var fill = 0L
        it.map { case (shard, docId, nTok) =>
          if (shard != curShard) { curShard = shard; bin = 0L; fill = 0L }
          else if (fill + nTok > capacity) { bin += 1L; fill = 0L }
          val offset = fill
          fill += nTok
          (shard, bin, docId, nTok, offset)
        }
      }
      .toDF("shard", "bin_id", "doc_id", "n_tok", "tok_offset")
  }

  /** Deterministic global shuffle order: position of each doc under the
    * total order (md5(doc_id), doc_id) — the "shuffled" training order
    * that reproduces across runs and engines with no RNG state.
    *
    * Computed WITHOUT a single-partition global sort: docs hash into 16
    * nibble bands; band counts (16 rows) come back to the driver and
    * become cumulative offsets; position = offset(band) + rank within
    * band. Two narrow shuffles (a count agg and a per-band window over
    * 16-byte keys), both metadata-only.
    *
    * Scale: band cardinality is bounded (16 here, more nibbles if a band
    * outgrows a partition) and the collected statistic is 16 longs —
    * the same shape as AQE's partition stats, not a data collect.
    */
  def globalShuffleOrder(docs: DataFrame): DataFrame = {
    val keyed = docs.select(
      col("doc_id").cast("long"),
      md5(col("doc_id").cast("string").cast("binary")).as("_k"),
      Sampling.hashNibble(col("doc_id")).as("_band"))
    val counts = keyed.groupBy(col("_band")).count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = (0 until 16).scanLeft(0L)((acc, b) => acc + counts.getOrElse(b, 0L))
    val offsetExpr = (0 until 16).foldLeft(lit(0L)) { (acc, b) =>
      when(col("_band") === b, lit(offsets(b))).otherwise(acc)
    }
    val w = Window.partitionBy(col("_band")).orderBy(col("_k"), col("doc_id"))
    keyed
      .withColumn("pos", row_number().over(w).cast("long") - 1L + offsetExpr)
      .select(col("doc_id"), col("pos"))
  }

  /** Sentence-boundary greedy chunking — the RAG-ingest shape
    * [[chunkTokens]]'s fixed windows cannot express: chunks never split
    * a sentence, accumulate whole sentences greedily up to `maxTokens`,
    * and an oversized single sentence gets its own chunk rather than
    * being dropped (a retrieval corpus must cover every sentence
    * exactly once). Packing is a RECURRENCE (each boundary depends on
    * the running remainder — no prefix-sum rewrite exists), so it runs
    * as a row-local `aggregate` fold with a finish lambda flushing the
    * trailing open chunk; the whole operator is ONE generator + fold
    * projection — zero shuffle, document text never leaves its row.
    *
    * Sentences split on the PLAIN-STRING `delim` (regex-quoted
    * internally; empties filtered — adjacent delimiters produce them);
    * token counts are whitespace tokens, the
    * [[graft.operators.TextAnalysis.tokens]] convention.
    *
    * Output: one row per chunk — (doc_id, chunk_idx, n_sentences,
    * n_tokens). */
  def chunkSentences(docs: DataFrame, idCol: String, textCol: String,
      maxTokens: Int, delim: String = ". "): DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1: $maxTokens")
    require(delim.nonEmpty && !delim.contains("'"), s"bad delim: $delim")
    val sents = docs.select(col(idCol).as("doc_id"),
        split(col(textCol), java.util.regex.Pattern.quote(delim)).as("_raw"))
      .select(col("doc_id"), expr("filter(_raw, x -> x != '')").as("_ss"))
    val folded = sents.select(col("doc_id"), expr(
      s"""aggregate(
         |  transform(_ss, s -> size(split(s, ' '))),
         |  struct(
         |    CAST(array() AS ARRAY<STRUCT<ns: BIGINT, nt: BIGINT>>) AS done,
         |    CAST(0 AS BIGINT) AS curn, CAST(0 AS BIGINT) AS curt),
         |  (acc, t) -> CASE
         |    WHEN acc.curn = 0 THEN
         |      struct(acc.done AS done, CAST(1 AS BIGINT) AS curn,
         |             CAST(t AS BIGINT) AS curt)
         |    WHEN acc.curt + t > $maxTokens THEN
         |      struct(acc.done || array(struct(acc.curn AS ns, acc.curt AS nt)) AS done,
         |             CAST(1 AS BIGINT) AS curn, CAST(t AS BIGINT) AS curt)
         |    ELSE struct(acc.done AS done, acc.curn + 1 AS curn,
         |                acc.curt + t AS curt) END,
         |  acc -> CASE WHEN acc.curn > 0
         |              THEN acc.done || array(struct(acc.curn AS ns, acc.curt AS nt))
         |              ELSE acc.done END
         |)""".stripMargin).as("_chunks"))
    folded
      .select(col("doc_id"), posexplode(col("_chunks")).as(Seq("chunk_idx", "_c")))
      .select(col("doc_id"), col("chunk_idx").cast("long").as("chunk_idx"),
        col("_c.ns").as("n_sentences"), col("_c.nt").as("n_tokens"))
  }
}
