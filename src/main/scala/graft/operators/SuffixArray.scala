package graft.operators

import org.apache.spark.TaskContext
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.store.Staging

/** Token-level suffix array over the document corpus by distributed
  * prefix doubling (Manber–Myers), the index behind exact-substring
  * ("suffix-array") dedup of training corpora (Lee et al. 2022,
  * "Deduplicating Training Data Makes Language Models Better" — the
  * ExactSubstr pipeline; the reference's scan layer stores documents it
  * never dedups, /root/reference/stores/file_store.py:8-27).
  *
  * Spark-first shape — three scale decisions, each replacing a
  * single-partition wall:
  *
  *  1. Global doc offsets (token position of each doc's start) are an
  *     exclusive prefix sum over per-doc lengths. A bare
  *     `Window.orderBy(doc_id)` would plan ONE partition holding every
  *     doc; [[prefixOffsets]] is the two-job terasort-style scan
  *     instead: range-partition + local sort, per-partition sums to the
  *     driver (one long per partition), cumulated offsets broadcast
  *     back, local streaming add. Works at any doc count.
  *
  *  2. Round-0 ranks (order by token string) go through the DISTINCT
  *     vocabulary: rank of a token = 1 + Σ counts of lexicographically
  *     smaller tokens, computed as a BANDED prefix sum over the vocab
  *     table (range-partition = contiguous key bands, per-band totals
  *     to the driver, in-band windows) joined back to positions — the
  *     vocab side is small by Heaps' law, but observed word BIGRAMS run
  *     to billions at corpus scale, so even that side never funnels
  *     through one partition.
  *
  *  3. Doubling rounds refine ranks GROUP-LOCALLY: with rank()
  *     (min-rank, ties share) semantics, a position whose rank is
  *     already unique keeps it forever, and a tied position's new rank
  *     is r + |{j in the same tied group : r2_j < r2_i}| — a window
  *     partitioned BY THE TIED GROUP, never a global sort. Rows leave
  *     the refinement set as their group resolves, so the tied slice
  *     each round shuffles only the still-ambiguous tail; the rank
  *     LOOKUP side is full-frame but shuffles ONCE per round — the
  *     shift arithmetic lives on the tied side so all three lookup
  *     exchanges are identical and ReuseExchange collapses them
  *     (per-round attribution in BUILDER_NOTES r8: every phase ~5× on
  *     5× input, the whole query exponent-fits 1.0 across 1×/5×/25×).
  *     Each round is staged through the parquet store layer
  *     ([[Staging]]), so the iteration reads files, not a 15-join
  *     lineage.
  *
  * Every doc ends with a per-doc UNIQUE separator token (U+0001 +
  * doc_id, sorting below all words), so suffix comparisons terminate at
  * doc boundaries, all suffixes are distinct, and the final ranks are a
  * permutation of 1..n.
  */
object SuffixArray {

  /** Exclusive prefix sum of `valCol` in `orderCol` order, distributed:
    * range-partition by `orderCol` (ties cannot split — the
    * RangePartitioner binary-searches boundary keys), local sort, one
    * collected long per partition, broadcast cumulative offsets, local
    * streaming add. Returns (orderCol, _ofs). */
  def prefixOffsets(df: DataFrame, orderCol: String, valCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val nPart = spark.sessionState.conf.numShufflePartitions
    val parted = df
      .select(col(orderCol).cast("long").as("_1"), col(valCol).cast("long").as("_2"))
      .as[(Long, Long)]
      .repartitionByRange(nPart, col("_1"))
      .sortWithinPartitions("_1")
      .persist(StorageLevel.MEMORY_AND_DISK)
    val sums = parted.mapPartitions { it =>
      var s = 0L
      it.foreach(s += _._2)
      Iterator.single((TaskContext.getPartitionId(), s))
    }.collect().sortBy(_._1)
    val offsets = sums.scanLeft((0, 0L)) { case ((_, acc), (pid, s)) => (pid, acc + s) }
      .sliding(2).map { case Array((_, acc), (pid, _)) => (pid, acc) }.toMap
    val bc = spark.sparkContext.broadcast(
      if (offsets.isEmpty) sums.map(p => (p._1, 0L)).toMap else offsets)
    val out = parted.mapPartitions { it =>
      var run = bc.value(TaskContext.getPartitionId())
      it.map { case (k, v) => val o = run; run += v; (k, o) }
    }.toDF(orderCol, "_ofs")
    val staged = Staging.stage(out, "sa_offsets")
    parted.unpersist()
    staged
  }

  /** (gpos, doc_id, pos, tok): the corpus token sequence — docs in
    * doc_id order, each followed by its unique separator token. */
  def corpusTokens(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs.select(
      col(idCol).cast("long").as("doc_id"),
      concat(
        split(col(textCol), " "),
        array(concat(lit("\u0001"), col(idCol).cast("string")))).as("_toks"))
    val lens = toks.select(col("doc_id"), size(col("_toks")).cast("long").as("_len"))
    val offs = prefixOffsets(lens, "doc_id", "_len")
    toks.join(offs, "doc_id")
      .select(col("doc_id"), col("_ofs"),
        posexplode(col("_toks")).as(Seq("pos", "tok")))
      .select(
        (col("_ofs") + col("pos")).as("gpos"),
        col("doc_id"),
        col("pos").cast("long").as("pos"),
        col("tok"))
  }

  /** Suffix ranks (gpos, doc_id, pos, sa_rank): sa_rank is the 1-based
    * position of suffix `gpos` in the lexicographic order of all corpus
    * suffixes (a permutation — separators make suffixes distinct).
    * `maxRounds` bounds the doubling (2^maxRounds ≥ corpus tokens);
    * the loop exits as soon as no ties remain, which on real corpora
    * happens long before the bound. */
  /** Instrumentation hook for [[suffixRanks]]: called after each
    * materialization barrier with (phaseLabel, tiedGroupCount) —
    * tiedGroupCount is −1 for phases that don't count ties. A probe
    * harness snapshots its shuffle-byte counter (after a listener-bus
    * drain) at each call to attribute shuffle per doubling round. */
  type RoundProbe = (String, Long) => Unit
  val noProbe: RoundProbe = (_, _) => ()

  def suffixRanks(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      maxRounds: Int = 22,
      probe: RoundProbe = noProbe): DataFrame = {
    val toks = Staging.stage(corpusTokens(docs, idCol, textCol), "sa_toks")
    probe("tokens", -1L)

    // Rounds 0+1 fused through the distinct BIGRAM vocabulary: ranking
    // by (tok, next tok) equals the first doubling round's rank over
    // (r_tok, r_tok@+1) — same min-rank, same null-is-smallest corpus-end
    // rule (nulls-first ≡ the -1 padding) — so the loop starts at
    // step 2 with one full-frame round already paid through the small
    // side. Observed word bigrams are NOT vocabulary-bounded (billions
    // at corpus scale), so the prefix sum over the bigram table runs
    // banded, never through one partition: range-partition in the sort
    // order (contiguous key ranges = bands), STAGE the banding so both
    // passes see identical bands, per-band count totals to the driver
    // (one long per band — AQE-stats-shaped), exclusive-prefix offsets
    // broadcast-join back, in-band prefix via a per-band window.
    val next = toks.select((col("gpos") - 1).as("gpos"), col("tok").as("tok2"))
    val bigrams = toks.join(next, Seq("gpos"), "left")
      .select(col("gpos"), col("tok"), col("tok2"))
    val vocab = bigrams.groupBy(col("tok"), col("tok2")).agg(count(lit(1)).as("_c"))
    val spark = docs.sparkSession
    import spark.implicits._
    val nPart = spark.sessionState.conf.numShufflePartitions
    val banded = Staging.stage(
      vocab.repartitionByRange(nPart, col("tok").asc, col("tok2").asc_nulls_first)
        .withColumn("_vb", spark_partition_id()),
      "sa_vocab_band")
    val bandSums = banded.groupBy(col("_vb")).agg(sum(col("_c")).as("_s"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val bandOff = bandSums.zip(bandSums.scanLeft(0L)(_ + _._2))
      .map { case ((b, _), off) => (b, off) }
    val offDf = broadcast(bandOff.toSeq.toDF("_vb", "_off"))
    val wB = Window.partitionBy(col("_vb"))
      .orderBy(col("tok").asc, col("tok2").asc_nulls_first)
    val vocabRank = banded.join(offDf, "_vb").select(
      col("tok"), col("tok2"),
      (col("_off") + sum(col("_c")).over(wB) - col("_c") + 1).as("r"))
    var ranks = Staging.stage(
      bigrams.join(vocabRank,
          bigrams("tok") === vocabRank("tok") && bigrams("tok2") <=> vocabRank("tok2"))
        .select(bigrams("gpos"), vocabRank("r")), "sa_r1")
    probe("vocab_r1", -1L)

    // 4-way fanout per refinement round: the tie-break key is the rank
    // at offsets (h, 2h, 3h), so the resolved prefix horizon GROWS ×4
    // per round instead of ×2 — h: 2 → 8 → 32 → 128 covers any ≤127-token
    // tail in 3 rounds where pairwise doubling needs 6. The trade is two
    // extra shift joins per round (shuffle bandwidth) against halving
    // the round count (scheduling latency + staging passes); after the
    // first round the tied side is a sliver, so the extra joins are
    // near-free while the saved rounds are whole passes.
    val fanout = 4
    var step = 2L
    var round = 1
    def tiedOf(r: DataFrame): DataFrame =
      r.groupBy(col("r")).agg(count(lit(1)).as("_n")).filter(col("_n") > 1)
        .select(col("r")).persist(StorageLevel.MEMORY_AND_DISK)
    // the tied-group frame is tiny (one row per still-ambiguous rank
    // value) but referenced three times per round (two joins + the
    // termination count) — persist it instead of re-aggregating
    var tiedGroups = tiedOf(ranks)
    var nTied = tiedGroups.count()
    probe("tied_r1", nTied)
    while (nTied > 0 && round < maxRounds) {
      var tied = ranks.join(tiedGroups, Seq("r"))
      // _rj = current rank of the suffix j·h positions later; beyond the
      // corpus end ranks as -1 (shorter suffix sorts first).
      //
      // The shift arithmetic lives on the TIED side (probe key
      // _pg = gpos + j·h), NOT on a `ranks.select(gpos − j·h)` lookup
      // side: with the shift on the full frame, each j's exchange hashes
      // a DIFFERENT derived column, so in the sort-merge regime (big
      // corpora — per-round SaProbe attribution, BUILDER_NOTES r8) the
      // full ranks frame shuffled once PER SHIFT, 3× per round. Probing
      // an unshifted `ranks` projection instead makes the three lookup
      // exchanges canonically identical, and Catalyst's ReuseExchange
      // collapses them to ONE full-frame shuffle per round; only the
      // tied slice (the shrinking side) reshuffles per shift.
      for (j <- 1 until fanout) {
        val probe = ranks.select(col("gpos").as("_pg"), col("r").as(s"_s$j"))
        tied = tied.withColumn("_pg", col("gpos") + lit(j * step))
          .join(probe, Seq("_pg"), "left")
          .withColumn(s"_r$j", coalesce(col(s"_s$j"), lit(-1L)))
          .drop("_pg", s"_s$j")
      }
      val keys = (1 until fanout).map(j => col(s"_r$j"))
      val refined = tied.select(col("gpos"),
        (col("r") + rank().over(
          Window.partitionBy(col("r")).orderBy(keys: _*)) - 1).as("r"))
      val resolved = ranks.join(tiedGroups, Seq("r"), "left_anti")
      ranks = Staging.stage(resolved.unionByName(refined), s"sa_round")
      probe(s"round${round}_stage_h$step", -1L)
      tiedGroups.unpersist()
      step *= fanout
      round += 1
      tiedGroups = tiedOf(ranks)
      nTied = tiedGroups.count()
      probe(s"round${round - 1}_tied", nTied)
    }
    require(nTied == 0,
      s"suffix ranking did not converge in $maxRounds rounds ($nTied tied groups left)")
    tiedGroups.unpersist()
    toks.join(ranks, "gpos")
      .select(col("gpos"), col("doc_id"), col("pos"), col("r").as("sa_rank"))
  }

  /** Exact-substring dedup (the ExactSubstr protocol at fixed minimum
    * length): every L-token window occurring ≥ 2 times ANYWHERE in the
    * corpus marks its positions duplicated; per doc, overlapping
    * duplicated windows merge into maximal spans (the union of repeated
    * L-windows EQUALS the union of maximal repeats of length ≥ L — each
    * maximal repeat of length M ≥ L is covered by its M−L+1 repeated
    * windows, and every repeated window lies inside a maximal repeat).
    * Windows are keyed by md5 of the window text: the shuffle carries 16
    * bytes per position instead of L tokens (~8×L bytes) — the Lee et
    * al. implementation makes the same hash-key trade.
    *
    * Output, one row per doc: n_tokens, n_dup_spans / n_dup_tokens
    * (maximal duplicated spans and their token count), and
    * n_removed_tokens — tokens covered by a window occurrence that is
    * NOT its key's corpus-first occurrence (min (doc_id, pos)), i.e.
    * the all-but-one-copy removal policy. */
  /** Cross-corpus exact-substring DECONTAMINATION — [[substringDedup]]'s
    * ACROSS-frames twin and the sequence-level complement of the n-gram
    * q_decontaminate pass (Lee et al. 2022's train/test overlap: an eval
    * document containing a verbatim ≥ L-token span of the training
    * corpus is contaminated — its benchmark score measures memorization,
    * not generalization). Every L-token window of the train corpus
    * becomes a 16-byte md5 key in a STAGED distinct index (the
    * production asset: built once per train snapshot, probed by every
    * eval refresh — the q_dedup_incremental contract, never an
    * eval×train product); eval windows semi-join the index and
    * overlapping hits merge into maximal leaked spans per eval doc (the
    * same union-of-L-windows = union-of-maximal-repeats-≥L argument as
    * substringDedup).
    *
    * Output, one row per EVAL doc: (doc_id, n_tokens, n_leak_spans,
    * n_leak_tokens, leak_ppm). */
  def crossSubstringLeak(
      train: DataFrame,
      evalDocs: DataFrame,
      idCol: String,
      textCol: String,
      l: Int): DataFrame = {
    require(l > 0, s"window length must be positive: $l")
    def windows(docs: DataFrame) = docs
      .select(col(idCol).cast("long").as("doc_id"),
        coalesce(TextAnalysis.tokens(col(textCol)), array().cast("array<string>"))
          .as("_toks"))
      .filter(size(col("_toks")) >= l)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("_toks")) - l, lit(1))).as("pos"),
        col("_toks"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(concat_ws(" ", slice(col("_toks"), col("pos") + 1, lit(l)))
          .cast("binary")).as("h"))
    val trainIdx = Staging.stage(
      windows(train).select(col("h")).distinct(), "substr_train_idx")
    val hits = windows(evalDocs).join(trainIdx, Seq("h"), "left_semi")
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = hits
      .withColumn("_newIsland",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(wDoc), lit(Long.MinValue / 2))
          + l, 1).otherwise(when(lag(col("pos"), 1).over(wDoc).isNull, 1).otherwise(0)))
      .withColumn("_island", sum(col("_newIsland")).over(wDoc))
      .groupBy(col("doc_id"), col("_island"))
      .agg((max(col("pos")) + l - min(col("pos"))).as("_spanTok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_leak_spans"), sum(col("_spanTok")).as("n_leak_tokens"))
    evalDocs
      .select(col(idCol).cast("long").as("doc_id"),
        coalesce(size(TextAnalysis.tokens(col(textCol))), lit(0))
          .cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_leak_spans"), lit(0L)).as("n_leak_spans"),
        coalesce(col("n_leak_tokens"), lit(0L)).as("n_leak_tokens"))
      .withColumn("leak_ppm",
        when(col("n_tokens") > 0,
          expr("CAST(CAST(n_leak_tokens AS DECIMAL(38,0)) * 1000000 DIV n_tokens AS BIGINT)"))
          .otherwise(0L))
  }

  def substringDedup(docs: DataFrame, idCol: String, textCol: String, l: Int): DataFrame = {
    require(l > 0, s"window length must be positive: $l")
    val base = docs.select(
      col(idCol).cast("long").as("doc_id"),
      coalesce(TextAnalysis.tokens(col(textCol)), array().cast("array<string>")).as("_toks"))
    val windows = base
      .filter(size(col("_toks")) >= l)
      .select(col("doc_id"),
        explode(sequence(lit(0), size(col("_toks")) - l, lit(1))).as("pos"),
        col("_toks"))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        md5(concat_ws(" ", slice(col("_toks"), col("pos") + 1, lit(l)))
          .cast("binary")).as("h"))
    val keyStats = windows.groupBy(col("h"))
      .agg(count(lit(1)).as("_n"),
        min(struct(col("doc_id"), col("pos"))).as("_first"))
      .filter(col("_n") >= 2)
    val dupOcc = windows.join(keyStats, Seq("h"))
      .select(col("doc_id"), col("pos"),
        (col("_first.doc_id") =!= col("doc_id") ||
          col("_first.pos") =!= col("pos")).as("_removable"))

    // maximal spans: windows all have length l, positions ascend, so a
    // new island starts exactly when pos > previous pos + l
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val spans = dupOcc
      .withColumn("_newIsland",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(wDoc), lit(Long.MinValue / 2))
          + l, 1).otherwise(when(lag(col("pos"), 1).over(wDoc).isNull, 1).otherwise(0)))
      .withColumn("_island", sum(col("_newIsland")).over(wDoc))
      .groupBy(col("doc_id"), col("_island"))
      .agg((max(col("pos")) + l - min(col("pos"))).as("_spanTok"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_dup_spans"), sum(col("_spanTok")).as("n_dup_tokens"))

    // removal coverage: positions covered by ≥1 non-first occurrence —
    // same island merge over the removable subset
    val removed = dupOcc.filter(col("_removable"))
      .withColumn("_newIsland",
        when(col("pos") > coalesce(lag(col("pos"), 1).over(wDoc), lit(Long.MinValue / 2))
          + l, 1).otherwise(when(lag(col("pos"), 1).over(wDoc).isNull, 1).otherwise(0)))
      .withColumn("_island", sum(col("_newIsland")).over(wDoc))
      .groupBy(col("doc_id"), col("_island"))
      .agg((max(col("pos")) + l - min(col("pos"))).as("_spanTok"))
      .groupBy(col("doc_id"))
      .agg(sum(col("_spanTok")).as("n_removed_tokens"))

    base.select(col("doc_id"), size(col("_toks")).cast("long").as("n_tokens"))
      .join(spans, Seq("doc_id"), "left")
      .join(removed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_dup_spans"), lit(0L)).as("n_dup_spans"),
        coalesce(col("n_dup_tokens"), lit(0L)).as("n_dup_tokens"),
        coalesce(col("n_removed_tokens"), lit(0L)).as("n_removed_tokens"))
  }
}
