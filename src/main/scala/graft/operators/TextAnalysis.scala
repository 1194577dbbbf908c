package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text analysis for training-data pipelines: token counting (whitespace
  * and BPE-ish regex), quality scoring (length/punct/stopword ratios),
  * n-gram-profile language ID, and rolling-hash document fingerprints.
  *
  * All pure column expressions (codegen'd, shuffle-free per-row), with
  * integer ppm outputs so oracle comparison never touches floats.
  */
object TextAnalysis {

  /** Whitespace tokens (single-space convention of the corpus).
    *
    * IMPORTANT: bind this as a real column (withColumn) before passing it
    * to any function here that filters/maps over it — interpreted HOF
    * lambdas re-evaluate captured expressions per element, so a captured
    * split is O(tokens²) per document. */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(toks: Column): Column = size(toks).cast("long")

  /** BPE-ish subword pre-tokenization count: runs of letters, runs of
    * digits, or single non-alphanumeric-non-space chars (the usual
    * byte-pair pre-split regex family). */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"), lit(0))).cast("long")

  /** Punctuation chars per million text chars. */
  def punctRatioPpm(text: Column): Column = {
    val punct = length(text) - length(regexp_replace(text, "[^a-zA-Z0-9 ]", ""))
    floor(punct.cast("long") * lit(1000000L) / length(text)).cast("long")
  }

  /** Mean token length in thousandths of a char. */
  def avgTokenLenMilli(text: Column, toks: Column): Column =
    floor(length(regexp_replace(text, " ", "")).cast("long") * lit(1000L) / size(toks)).cast("long")

  /** Syllable estimate: count of vowel-group runs ([aeiouy]+), the
    * standard dictionary-free heuristic readability formulas are
    * calibrated against (each maximal vowel run ≈ one syllable
    * nucleus). */
  def syllableCountish(text: Column): Column =
    size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0))).cast("long")

  /** Sentence count: runs of terminal punctuation ([.!?]+), so "?!" and
    * "..." close ONE sentence; floored at 1 (terminator-free text is one
    * sentence). */
  def sentenceCount(text: Column): Column =
    greatest(size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("long"), lit(1L))

  /** Flesch-Kincaid grade level in milli-grades, every division floored
    * so both engines replay bit-identically:
    *
    *   fk_milli = floor(390·W/S) + floor(11800·Sy/W) − 15590
    *
    * (the textbook 0.39·W/S + 11.8·Sy/W − 15.59, scaled ×1000 with the
    * two ratio terms floored independently — a documented ≤2 milli-grade
    * under-approximation of the real-valued formula). Callers pass
    * PRE-BOUND count columns (the langIdFromScores binding rule). */
  def fkGradeMilli(words: Column, sents: Column, sylls: Column): Column =
    (floor(lit(390L) * words / greatest(sents, lit(1L))).cast("long") +
      floor(lit(11800L) * sylls / greatest(words, lit(1L))).cast("long") -
      lit(15590L)).cast("long")

  /** Stopword lists for the n-gram-free language-ID heuristic: score each
    * language by the fraction of tokens in its list, argmax with a fixed
    * priority order for ties. */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "fr" -> Seq("le", "la", "de", "et", "un", "une", "est", "que", "pour", "dans"),
    "es" -> Seq("el", "la", "de", "y", "un", "una", "es", "que", "para", "en"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "ist", "dass", "für", "im"),
    "zh" -> Seq("的", "了", "是", "在", "我", "有", "和", "就", "不", "人"))

  /** #tokens in `words`, duplicates counted (filter+size, not intersect). */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*))).cast("long")

  def stopwordRatioPpm(toks: Column): Column = {
    val all = stopwords.flatMap(_._2)
    floor(stopwordHits(toks, all) * lit(1000000L) / size(toks)).cast("long")
  }

  /** stopword ppm from a PRE-BOUND hit-count column (see langIdFromScores
    * for why binding matters). */
  def stopwordRatioPpmFromHits(allHits: Column, toks: Column): Column =
    floor(allHits * lit(1000000L) / size(toks)).cast("long")

  /** Language ID argmax from PRE-BOUND per-language hit-count columns.
    *
    * Bind each `stopwordHits` as a real column (withColumn) before calling
    * this: the argmax references every score once in `greatest` and twice
    * per `when` arm — with raw expressions that duplicates each
    * interpreted HOF filter pass ~7× per language per row (this was
    * q_text_stats at 27 s/sf0.1; bound: ~2 s). Ties fall to declaration
    * order (en first) — mirrored verbatim in the SQL oracle. */
  def langIdFromScores(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2).reduce((a, b) => greatest(a, b))
    scores.foldRight(lit("und")) { case ((lang, s), acc) =>
      when(s === best && s > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Language ID over a token column (convenience for tests/small data;
    * hot paths should bind scores and use langIdFromScores). */
  def langId(toks: Column): Column =
    langIdFromScores(stopwords.map { case (lang, words) => lang -> stopwordHits(toks, words) })

  /** Character-bigram profiles for the N-GRAM language-ID heuristic,
    * derived deterministically from the stopword lists (distinct bigrams
    * of each word; words shorter than 2 chars — the zh single-char
    * function words — contribute themselves). Being a Scala constant,
    * the profile is inlined identically into the Spark plan and the SQL
    * oracle text — no cross-engine derivation to diverge. */
  val bigramProfiles: Seq[(String, Seq[String])] = stopwords.map { case (lang, words) =>
    lang -> words.flatMap(w => if (w.length < 2) Seq(w) else w.sliding(2).toSeq).distinct
  }

  /** |text bigrams ∩ profile| — the n-gram-profile score. `bigrams`
    * should be a bound column of DISTINCT char 2-grams
    * (Dedup.charShingles(text, 2)); array_intersect is a native set op,
    * not an interpreted HOF. */
  def bigramHits(bigrams: Column, profile: Seq[String]): Column =
    size(array_intersect(bigrams, typedlit(profile))).cast("long")

  /** Composite quality score in [0, 1e6]: 40% length band (50..5000
    * chars), 30% stopword presence band (≥2% tokens), 30% punctuation
    * sanity band (≤20% chars). Deterministic integer arithmetic. */
  def qualityScorePpm(text: Column, toks: Column): Column =
    qualityScorePpmFromHits(text, toks, stopwordHits(toks, stopwords.flatMap(_._2)))

  /** Quality score from a PRE-BOUND all-stopword hit column (one filter
    * pass shared with stopwordRatioPpmFromHits instead of two). */
  def qualityScorePpmFromHits(text: Column, toks: Column, allHits: Column): Column = {
    val lenOk = length(text).between(50, 5000)
    val stopOk = stopwordRatioPpmFromHits(allHits, toks) >= 20000
    val punctOk = punctRatioPpm(text) <= 200000
    (when(lenOk, 400000L).otherwise(0L)
      + when(stopOk, 300000L).otherwise(0L)
      + when(punctOk, 300000L).otherwise(0L)).cast("long")
  }

  /** Normalization scrub for training corpora: lowercase, strip
    * non-alphanumeric (keeping spaces), collapse whitespace runs, trim.
    * Pure codegen'd regexp_replace chain. */
  def cleanText(text: Column): Column =
    trim(regexp_replace(regexp_replace(lower(text), "[^a-z0-9 ]", ""), " +", " "))

  /** URL canonicalization (the crawl-dedup key step): drop the fragment,
    * lowercase scheme+host (ONLY — paths are case-sensitive), strip
    * `www.`, drop tracking params (utm_*, ref), tidy the leftover
    * `?`/`&` punctuation, strip one trailing slash. Every rule is a
    * codegen'd regexp_replace with RE2-safe patterns (no backreferences,
    * no lookaround) so any regex engine — and the DuckDB oracle —
    * applies them identically. Row-local: canonicalizing 100 TB of URLs
    * shuffles nothing until the groupBy on the canonical key. */
  def canonicalUrl(url: Column): Column = {
    val noFrag = regexp_replace(url, "#.*$", "")
    // scheme+host = the prefix matching ^scheme://host — lowercase just
    // that span (paths/queries are case-sensitive by RFC 3986)
    val head = regexp_extract(noFrag, "^[a-zA-Z]+://[^/?]*", 0)
    val lowered = concat(lower(head), substring(noFrag, length(head) + 1, lit(1000000)))
    // strip www. without replacement backreferences (Spark writes $1,
    // DuckDB writes \1 — two scheme-anchored literal rules need neither)
    val noWww = regexp_replace(
      regexp_replace(lowered, "^http://www\\.", "http://"),
      "^https://www\\.", "https://")
    // tracking params in all three positions: &-prefixed anywhere,
    // ?-prefixed with more params after it, ?-prefixed as the only param
    val noTrack = regexp_replace(
      regexp_replace(
        regexp_replace(noWww, "&(utm_[a-z]+|ref)=[^&#]*", ""),
        "\\?(utm_[a-z]+|ref)=[^&#]*&", "?"),
      "\\?(utm_[a-z]+|ref)=[^&#]*$", "")
    regexp_replace(noTrack, "/$", "")
  }

  /** Rolling-hash document fingerprints over word shingles: min/max md5
    * (winnowing-style selection) plus shingle cardinality. Same
    * distributed shape as Dedup.minhashSignatures — explode → codegen'd
    * md5 → map-side-combined min/max per doc (HOF lambdas would run
    * interpreted). Docs with no shingles drop out. */
  def fingerprintFrame(docs: org.apache.spark.sql.DataFrame, idCol: String, shingles: Column): org.apache.spark.sql.DataFrame =
    docs.repartition(col(idCol))
      .select(col(idCol), explode(shingles).as("_s"))
      .select(col(idCol), col("_s"), md5(col("_s").cast("binary")).as("_h"))
      .groupBy(col(idCol))
      .agg(
        countDistinct(col("_s")).as("n_shingles"),
        min(col("_h")).as("fp_min"),
        max(col("_h")).as("fp_max"))

  /** Log-free tf-idf top terms per document — the term-salience ranking a
    * curation pipeline uses for topic tagging / keyword extraction.
    * score_ppm = floor(tf · 10⁶ · N / (n_toks · df)): the classic
    * tf-normalized × inverse-document-frequency weighting with the log
    * dropped, so the score is EXACT integer-derived arithmetic (every
    * intermediate < 2^53) and reproduces bit-identically in any engine —
    * a log would tie the oracle to libm rounding. Ranking is unaffected
    * for a single document up to the monotone log transform of df alone;
    * ties break by term.
    *
    * Scale shape: tf is a map-side-combined groupBy(doc, term); df is a
    * distinct + groupBy(term); the tf⋈df equi-join shuffles on term
    * (both sides keyed — no broadcast assumption about vocabulary size);
    * the corpus count N broadcasts as one row; top-k is a per-doc window
    * rank, no global sort. */
  def tfidfTopTerms(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int): org.apache.spark.sql.DataFrame = {
    val ex = docs.repartition(col(idCol))
      .withColumn("_toks", tokens(col(textCol)))
      .select(col(idCol), size(col("_toks")).cast("long").as("_n"),
        explode(col("_toks")).as("term"))
    val tf = ex.groupBy(col(idCol), col("_n"), col("term")).agg(count(lit(1)).as("_tf"))
    val dfreq = ex.select(col(idCol), col("term")).distinct()
      .groupBy(col("term")).agg(count(lit(1)).as("_df"))
    val nDocs = docs.select(count(lit(1)).as("_nd"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(idCol)).orderBy(col("score_ppm").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(broadcast(nDocs))
      .withColumn("score_ppm",
        floor(col("_tf") * lit(1000000L) * col("_nd") / (col("_n") * col("_df"))).cast("long"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col(idCol), col("rank"), col("term"), col("score_ppm"))
  }

  /** Per-document repetition statistics — the Gopher/C4-family
    * boilerplate filters (a doc whose mass concentrates in one token /
    * one bigram, or with a collapsed distinct-token ratio, is template or
    * spam, not prose): fraction of tokens that are the single most
    * frequent token, fraction of word bigrams that are the most frequent
    * bigram, and distinct-token ratio — all integer ppm.
    *
    * Scale shape: two explode → map-side-combined double groupBys (per
    * (doc, gram) count, then per-doc max/sum/count); documents with < 2
    * tokens have no bigram and report 0. */
  def repetitionStats(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val base = docs.repartition(col(idCol))
      .withColumn("_toks", tokens(col(textCol)))
    val tokAgg = base.select(col(idCol), explode(col("_toks")).as("_t"))
      .groupBy(col(idCol), col("_t")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg(max(col("_c")).as("_top"), sum(col("_c")).as("_n"), count(lit(1)).as("_d"))
    val bigAgg = base.select(col(idCol), explode(Dedup.tokenShingles(col("_toks"), 2)).as("_b"))
      .groupBy(col(idCol), col("_b")).agg(count(lit(1)).as("_c"))
      .groupBy(col(idCol))
      .agg(max(col("_c")).as("_btop"), sum(col("_c")).as("_bn"))
    tokAgg.join(bigAgg, Seq(idCol), "left")
      .select(col(idCol),
        floor(col("_top") * lit(1000000L) / col("_n")).cast("long").as("top_tok_ppm"),
        coalesce(floor(col("_btop") * lit(1000000L) / col("_bn")).cast("long"), lit(0L))
          .as("top_bigram_ppm"),
        floor(col("_d") * lit(1000000L) / col("_n")).cast("long").as("distinct_tok_ppm"))
  }

  /** Corpus-trained bigram-LM fluency score — the log-free integer form
    * of the CCNet/Gopher LM quality filter (docs whose token transitions
    * are improbable under the corpus's own bigram model are noise/spam):
    * per doc, the mean over its token bigrams of
    * floor(10⁶ · c(w1,w2) / c(w1·)), where both counts come from the
    * corpus bigram stream (so transition mass sums to 1 per prefix).
    * Every term and the final mean are floored longs — no log, no libm,
    * reproduces exactly in any engine. Docs with < 2 tokens have no
    * bigram and drop out.
    *
    * Scale shape: the model is two map-side-combined groupBys over the
    * exploded bigram stream; scoring joins the doc bigrams to the model
    * ON THE BIGRAM (both sides shuffled — no model-size broadcast
    * assumption); the per-doc mean is a combinable agg. */
  def bigramLmScore(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val bi = docs.repartition(col(idCol))
      .withColumn("_toks", tokens(col(textCol)))
      .select(col(idCol), explode(Dedup.tokenShingles(col("_toks"), 2)).as("_bg"))
    val c2 = bi.groupBy(col("_bg")).agg(count(lit(1)).as("_c2"))
    val c1 = bi.select(substring_index(col("_bg"), " ", 1).as("_w1"))
      .groupBy(col("_w1")).agg(count(lit(1)).as("_c1"))
    bi.join(c2, Seq("_bg"))
      .withColumn("_w1", substring_index(col("_bg"), " ", 1))
      .join(c1, Seq("_w1"))
      .withColumn("_t", floor(col("_c2") * lit(1000000L) / col("_c1")).cast("long"))
      .groupBy(col(idCol))
      .agg(floor(sum(col("_t")) / count(lit(1))).cast("long").as("fluency_ppm"),
        count(lit(1)).as("n_bigrams"))
  }

  /** Collocation mining: corpus bigrams ranked by POINTWISE MUTUAL
    * INFORMATION — in the log-free form this repo uses everywhere
    * (the [[logOddsTerms]] precedent): PMI = log(p₁₂/(p₁p₂)) is a
    * MONOTONE function of the integer cross-ratio n₁₂·N/(n₁·n₂), so
    * ranking by the floored-ppm ratio IS ranking by PMI with zero libm.
    * `minCount` keeps hapax pairs (n₁₂ = n₁ = n₂ = 1 maximizes raw PMI
    * — the classic failure mode) out of the shortlist; this is the
    * phrase-mining / tokenizer-seeding pass of a text pipeline.
    *
    * Scale shape: two map-side-combined count groupBys (bigrams,
    * unigrams) over exploded streams; margins join ON THE WORD (no
    * vocabulary broadcast assumption); the corpus total rides a 1-row
    * broadcast; the final shortlist is a TakeOrdered top-k, never a
    * global sort. Output: (bigram, n12, n1, n2, pmi_ppm), top k by
    * (pmi_ppm desc, bigram). */
  def collocations(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      minCount: Long,
      k: Int): org.apache.spark.sql.DataFrame = {
    require(minCount >= 1 && k >= 1, s"bad args: minCount=$minCount k=$k")
    val toks = docs.repartition(col(idCol)).withColumn("_toks", tokens(col(textCol)))
    val bi = toks.select(explode(Dedup.tokenShingles(col("_toks"), 2)).as("_bg"))
    val uni = toks.select(explode(col("_toks")).as("_w"))
    val c2 = bi.groupBy(col("_bg")).agg(count(lit(1)).as("n12"))
      .filter(col("n12") >= minCount)
    val c1 = uni.groupBy(col("_w")).agg(count(lit(1)).as("_c1"))
    val nTok = uni.agg(count(lit(1)).as("_nt"))
    c2.withColumn("_w1", substring_index(col("_bg"), " ", 1))
      .withColumn("_w2", substring_index(col("_bg"), " ", -1))
      .join(c1.select(col("_w").as("_w1"), col("_c1").as("n1")), Seq("_w1"))
      .join(c1.select(col("_w").as("_w2"), col("_c1").as("n2")), Seq("_w2"))
      .crossJoin(broadcast(nTok))
      .select(col("_bg").as("bigram"), col("n12"), col("n1"), col("n2"),
        expr("CAST(CAST(n12 AS DECIMAL(38,0)) * _nt * 1000000 DIV " +
          "(CAST(n1 AS DECIMAL(38,0)) * n2) AS BIGINT)").as("pmi_ppm"))
      .orderBy(col("pmi_ppm").desc, col("bigram"))
      .limit(k)
  }

  /** Stupid-backoff trigram LM scoring (Brants et al. 2007, "Large
    * Language Models in Machine Translation") — THE web-scale n-gram
    * smoothing: no discount mass bookkeeping, just back off with a
    * fixed 0.4 factor, which is exactly what makes it integer-exact
    * here (0.4 = 400000 ppm, 0.4² = 160000 ppm; no log, no libm):
    *
    *   S(w3|w1w2) = c(w1w2w3)/c(w1w2)          if the trigram is seen
    *              = 0.4·c(w2w3)/c(w2)          else if the bigram is
    *              = 0.4²·c(w3)/N               else if the unigram is
    *              = 0                          else
    *
    * The model trains on the `trainFilter` slice (yesterday's corpus)
    * and scores the REST (today's batch) — self-scoring would never
    * back off (a self-trained model has seen every trigram), and the
    * train/eval split is the real shape of an incremental quality
    * gate. Per doc: the floored mean term plus the per-level hit
    * census (how much of the doc the model had to back off on — itself
    * a novelty signal).
    *
    * Scale shape: three map-side-combined count groupBys over the
    * train-side gram streams build the model; scoring left-joins the
    * eval trigram stream ON the gram keys (both sides shuffled — no
    * model-broadcast assumption, gram vocabularies are corpus-sized);
    * the total-token count rides a 1-row broadcast; the per-doc mean is
    * a combinable aggregation. Output: (idCol, n_trigrams, score_ppm,
    * n_hit3, n_hit2, n_hit1); eval docs with < 3 tokens drop out. */
  def stupidBackoffScore(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      trainFilter: Column): org.apache.spark.sql.DataFrame = {
    val base = graft.store.Staging.stage(
      docs.repartition(col(idCol))
        .withColumn("_toks", tokens(col(textCol)))
        .withColumn("_train", trainFilter)
        .select(col(idCol), col("_train"), col("_toks")),
      "sb_toks")
    val tri = base.select(col(idCol), col("_train"),
      explode(Dedup.tokenShingles(col("_toks"), 3)).as("_tg"))
    val biTrain = base.filter(col("_train"))
      .select(explode(Dedup.tokenShingles(col("_toks"), 2)).as("_bg"))
    val uniTrain = base.filter(col("_train"))
      .select(explode(col("_toks")).as("_w"))
    val c3 = tri.filter(col("_train")).groupBy(col("_tg")).agg(count(lit(1)).as("_c3"))
    val c2 = biTrain.groupBy(col("_bg")).agg(count(lit(1)).as("_c2"))
    val c1 = uniTrain.groupBy(col("_w")).agg(count(lit(1)).as("_c1"))
    val nTok = uniTrain.agg(count(lit(1)).as("_n"))
    val eval_ = tri.filter(!col("_train"))
      .withColumn("_w12", substring_index(col("_tg"), " ", 2))
      .withColumn("_w23", substring_index(col("_tg"), " ", -2))
      .withColumn("_w2", substring_index(col("_w23"), " ", 1))
      .withColumn("_w3", substring_index(col("_tg"), " ", -1))
    val scored = eval_
      .join(c3, Seq("_tg"), "left")
      .join(c2.select(col("_bg").as("_w12"), col("_c2").as("_c2p")), Seq("_w12"), "left")
      .join(c2.select(col("_bg").as("_w23"), col("_c2").as("_c2b")), Seq("_w23"), "left")
      .join(c1.select(col("_w").as("_w2"), col("_c1").as("_c1w2")), Seq("_w2"), "left")
      .join(c1.select(col("_w").as("_w3"), col("_c1").as("_c1w3")), Seq("_w3"), "left")
      .crossJoin(broadcast(nTok))
      .withColumn("_lvl",
        when(col("_c3").isNotNull, 3L)
          .when(col("_c2b").isNotNull, 2L)
          .when(col("_c1w3").isNotNull, 1L)
          .otherwise(0L))
      .withColumn("_t",
        when(col("_lvl") === 3L,
          floor(col("_c3") * lit(1000000L) / col("_c2p")).cast("long"))
          .when(col("_lvl") === 2L,
            floor(col("_c2b") * lit(400000L) / col("_c1w2")).cast("long"))
          .when(col("_lvl") === 1L,
            floor(col("_c1w3") * lit(160000L) / col("_n")).cast("long"))
          .otherwise(0L))
    scored.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_trigrams"),
        floor(sum(col("_t")) / count(lit(1))).cast("long").as("score_ppm"),
        sum(when(col("_lvl") === 3L, 1L).otherwise(0L)).as("n_hit3"),
        sum(when(col("_lvl") === 2L, 1L).otherwise(0L)).as("n_hit2"),
        sum(when(col("_lvl") === 1L, 1L).otherwise(0L)).as("n_hit1"))
  }

  /** DSIR-style importance weighting (Xie et al. 2023, "Data Selection
    * for Language Models via Importance Resampling") in this repo's
    * log-free integer form: rank each document by how much more fluent
    * it is under a TARGET-domain bigram model than under the general
    * SOURCE model trained on the whole corpus. DSIR's log importance
    * weight Σ_f log p_tgt(f) − log p_src(f) over n-gram features
    * becomes the DIFFERENCE of two [[bigramLmScore]]-style floored-ppm
    * fluency means over the same token-bigram feature stream — exact
    * integers, no libm logs, engine-reproducible. A bigram the target
    * model never saw contributes 0 target mass (the floor of any
    * sub-ppm smoothed probability); the source model is self-trained,
    * so every bigram is seen on that side.
    *
    * Scale shape: the bigram stream is staged ONCE (compact (doc_id,
    * is-target, bigram) rows) and feeds both models' groupBys AND the
    * scoring joins; model joins are ON THE BIGRAM / prefix (both sides
    * shuffled — no model-broadcast assumption, bigram vocabularies are
    * corpus-sized); per-doc means are combinable aggregations. The
    * downstream resampling step is [[graft.operators.Sampling]]'s
    * weighted systematic sample over importance_ppm.
    *
    * `targetFilter` is any boolean Column over `docs`' columns (e.g.
    * lang = 'en', or a quality-score threshold). Output: (idCol,
    * n_bigrams, fluency_target_ppm, fluency_source_ppm,
    * importance_ppm = target − source); docs with < 2 tokens drop out
    * (no features — DSIR has nothing to weigh). */
  def dsirImportance(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      targetFilter: Column): org.apache.spark.sql.DataFrame = {
    val bi = graft.store.Staging.stage(
      df.repartition(col(idCol))
        .withColumn("_toks", tokens(col(textCol)))
        .withColumn("_tgt", targetFilter)
        .select(col(idCol), col("_tgt"),
          explode(Dedup.tokenShingles(col("_toks"), 2)).as("_bg")),
      "dsir_bi")
    def model(src: org.apache.spark.sql.DataFrame, suffix: String) = (
      src.groupBy(col("_bg")).agg(count(lit(1)).as(s"_c2$suffix")),
      src.select(substring_index(col("_bg"), " ", 1).as("_w1"))
        .groupBy(col("_w1")).agg(count(lit(1)).as(s"_c1$suffix")))
    val (c2t, c1t) = model(bi.filter(col("_tgt")), "t")
    val (c2s, c1s) = model(bi, "s")
    bi.withColumn("_w1", substring_index(col("_bg"), " ", 1))
      .join(c2t, Seq("_bg"), "left")
      .join(c1t, Seq("_w1"), "left")
      .join(c2s, Seq("_bg"))
      .join(c1s, Seq("_w1"))
      .withColumn("_tt",
        coalesce(floor(col("_c2t") * lit(1000000L) / col("_c1t")), lit(0L)).cast("long"))
      .withColumn("_ts", floor(col("_c2s") * lit(1000000L) / col("_c1s")).cast("long"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_bigrams"),
        floor(sum(col("_tt")) / count(lit(1))).cast("long").as("fluency_target_ppm"),
        floor(sum(col("_ts")) / count(lit(1))).cast("long").as("fluency_source_ppm"))
      .withColumn("importance_ppm",
        (col("fluency_target_ppm") - col("fluency_source_ppm")).cast("long"))
  }

  /** PII scrub — the redaction pass a curation pipeline runs before
    * training: replace email-shaped and long-digit-run (phone/account)
    * spans with typed placeholders and count what was redacted. The
    * patterns are deliberately simple character-class regexes that parse
    * identically under Java regex and RE2, so the scrub reproduces
    * bit-for-bit in the oracle engine. Pure codegen'd projection. */
  val emailPattern = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
  val longDigitPattern = "[0-9]{7,}"

  /** Email spans replaced first, digit runs second — so a digit run
    * inside an email address is redacted (and counted) as part of the
    * email, not double-counted. Counts are over what each stage actually
    * replaced. */
  def emailScrub(text: Column): Column = regexp_replace(text, emailPattern, "<EMAIL>")
  def digitScrub(text: Column): Column = regexp_replace(text, longDigitPattern, "<NUM>")
  def patternCount(text: Column, pattern: String): Column =
    size(regexp_extract_all(text, lit(pattern), lit(0))).cast("long")

  /** Winnowing fingerprints (Schleimer/Wilkerson/Aiken): hash EVERY
    * positional char k-gram, slide a window of `w` consecutive hashes,
    * select each window's minimum — the distinct selected hashes are the
    * document's fingerprint set. Guarantee: any shared substring of
    * length ≥ k + w − 1 yields at least one shared fingerprint, while
    * only ~1/w of hashes are kept. (The min/max fingerprintFrame above
    * is the cheaper whole-document summary; winnowing is the
    * position-robust one plagiarism/near-dup tools use.)
    *
    * Shape: the whole selection runs ROW-LOCAL in the native WinnowExpr
    * kernel (hash every position, slide the window, dedup the mins in
    * one pass) — no explode, no per-doc window sort, no shuffle; the
    * frame is a pure projection. The first, declarative version of this
    * operator (posexplode → window min over pos → countDistinct) shuffled
    * 5M (doc, pos, hash) rows at sf0.1 and cost 9.4 s; the kernel is
    * sub-second for identical output (differential-tested against a
    * reference implementation in DedupSpec). Docs with fewer than
    * k + w − 1 chars have no full window and drop out — mirrored by the
    * oracle. */
  def winnowFrame(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      k: Int,
      w: Int): org.apache.spark.sql.DataFrame =
    docs.repartition(col(idCol))
      .withColumn("_fp", graft.functions.SetOps.winnowHashesCol(col(textCol), k, w))
      .filter(size(col("_fp")) > 0)
      .select(col(idCol),
        size(col("_fp")).cast("long").as("n_fp"),
        array_min(col("_fp")).as("fp_min"),
        array_max(col("_fp")).as("fp_max"))

  /** BM25 ranked retrieval with RATIONAL-integer arithmetic (k1 = 6/5,
    * b = 3/4, Robertson idf argument (N−df+0.5)/(df+0.5) =
    * (2N−2df+1)/(2df+1)): every per-(doc, term) contribution reduces to
    * one integer floor-division
    *
    *   (S·(2N−2df+1)·44·tf·Σdl) DIV ((2df+1)·(20·tf·Σdl + 6·Σdl + 18·dl·N))
    *
    * so the score (in 1/S units, S = 10000 basis points) is exact,
    * order-independent under summation, and reproducible in any engine —
    * a float BM25 would tie the hash compare to libm's ln().
    *
    * The products run in decimal(38,0), not Int64 (ADVICE r5 #1): the
    * numerator is ~S·2N·44·tf·Σdl, which passes 2^63 already at ~10^9
    * total tokens × 10^8 docs and would silently wrap in non-ANSI Spark
    * while DuckDB promotes — the engines would diverge exactly at the
    * scale the operator claims. Decimal keeps the arithmetic exact up to
    * 10^38, i.e. N·tf·Σdl < ~10^32 — comfortably past a 100 TB corpus
    * (10^10 docs × 10^13 tokens needs ~10^29); the quotient itself is
    * small and DIV returns a long, so the output schema is unchanged.
    *
    * Shape: only postings of the query's terms survive the explode
    * (row-local filter), so the shuffle carries |terms|·df postings, not
    * the corpus; df and the corpus totals broadcast (3 rows + 1 row).
    * At 100 TB serve the same arithmetic from the staged inverted index
    * (q_phrase_search's) instead of re-tokenizing. */
  def bm25TopK(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      queryTerms: Seq[String],
      k: Int,
      scale: Int = 10000): org.apache.spark.sql.DataFrame = {
    require(queryTerms.nonEmpty && k > 0)
    val toks = docs.select(col(idCol), tokens(col(textCol)).as("_toks"))
    val dl = toks.select(col(idCol), size(col("_toks")).cast("long").as("dl"))
    val totals = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sumdl"))
    val tf = toks.select(col(idCol), explode(col("_toks")).as("term"))
      .filter(col("term").isin(queryTerms: _*))
      .groupBy(col(idCol), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("dfreq"))
    tf.join(broadcast(dfreq), "term")
      .join(dl, idCol)
      .crossJoin(broadcast(totals))
      .withColumn("_contrib", expr(
        s"(CAST($scale AS DECIMAL(38,0)) * (2*n_docs - 2*dfreq + 1) * 44 * tf * sumdl) DIV " +
          "(CAST(2*dfreq + 1 AS DECIMAL(38,0)) * (CAST(20 AS DECIMAL(38,0))*tf*sumdl + CAST(6 AS DECIMAL(38,0))*sumdl + CAST(18 AS DECIMAL(38,0))*dl*n_docs))"))
      .groupBy(col(idCol))
      .agg(sum(col("_contrib")).as("score_bp"))
      .orderBy(col("score_bp").desc, col(idCol))
      .limit(k)
  }

  /** Reciprocal-rank fusion (Cormack/Clarke/Büttcher) of N ranked runs —
    * the standard hybrid-retrieval combiner (lexical BM25 list + semantic
    * ANN list, or any mix). Each run contributes 10⁶ DIV (kRrf + rank)
    * per id — the integer floor of the 1/(k+rank) RRF term in ppm, so
    * fused scores are exact, order-independent under summation, and
    * engine-reproducible (a float 1/(k+r) would tie the compare to
    * rounding order). kRrf = 60 is the published default.
    *
    * Shape: union of the runs' (id, rank) pairs → one groupBy on id.
    * Runs are top-k lists (tiny — k rows each), so at any corpus scale
    * the fusion itself is negligible; the cost lives in the upstream
    * retrieval, where it belongs. Ranks are 1-BASED (rank 0 is legal
    * too since kRrf > 0); negative or null ranks are dropped, and a
    * duplicate id within one run counts once at its BEST (minimum)
    * rank — a malformed run can't inflate n_lists or the fused score
    * (ADVICE r6). NOTE the min-rank dedup is a semantic choice: a caller
    * that fed duplicate ids expecting SUMMED contributions gets the best
    * rank only (standard RRF treats a run as a ranking, where an id
    * appears once). The per-run dedup aggregation runs over k-row top-k
    * lists, so its cost is negligible at any corpus scale (ADVICE r7).
    * Output: (idCol, n_lists, rrf_ppm), descending
    * rrf_ppm, ties to the smaller id. */
  def rrfFuse(
      runs: Seq[org.apache.spark.sql.DataFrame],
      idCol: String,
      rankCol: String,
      kRrf: Int,
      topK: Int): org.apache.spark.sql.DataFrame = {
    require(runs.nonEmpty && kRrf > 0 && topK > 0)
    runs.map(_.select(col(idCol), col(rankCol).cast("long").as("_rank"))
        .filter(col("_rank").isNotNull && col("_rank") >= 0)
        .groupBy(col(idCol)).agg(min(col("_rank")).as("_rank")))
      .reduce(_ unionByName _)
      .withColumn("_contrib", expr(s"CAST(1000000 AS BIGINT) DIV ($kRrf + _rank)"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_lists"), sum(col("_contrib")).as("rrf_ppm"))
      .orderBy(col("rrf_ppm").desc, col(idCol))
      .limit(topK)
  }

  /** Dictionary phrase tagging — the FlashText/Aho-Corasick class of a
    * training pipeline (topic labeling, badword filtering, PII keyword
    * flagging), done join-style: token n-grams of each document explode
    * once PER DISTINCT PHRASE LENGTH in the dictionary and broadcast-join
    * the phrase list. The scan side is Σ_L n_tokens rows (L = distinct
    * phrase lengths — keep dictionaries to a few lengths, the usual
    * shape); the dictionary side broadcasts (phrase lists are
    * MB-class even at production size), so no shuffle ever carries
    * document text and corpus scale-out is embarrassing. A trie matcher
    * in a UDF would save the explode but lose codegen and put the match
    * loop outside Catalyst; the n-gram join keeps everything
    * whole-stage-codegen and lets Catalyst prune/reorder.
    *
    * `dict` rows are (tag, phrase); phrases are space-separated token
    * sequences, matched EXACTLY (tokenization = [[tokens]]). Output:
    * (idCol, tag, n_hits, first_pos) per document × matched tag, where
    * first_pos is the 0-based token offset of the earliest hit — the
    * census a filter/router consumes. Documents shorter than a phrase
    * length simply generate no candidates for it. */
  def tagKeywords(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      dict: Seq[(String, String)]): org.apache.spark.sql.DataFrame = {
    // duplicate (tag, phrase) rows would double-count every hit, and a
    // phrase with leading/trailing/double spaces can never match a gram
    // built by concat_ws — reject the latter, dedup the former
    val entries = dict.distinct
    require(entries.nonEmpty, "empty dictionary")
    require(entries.forall { case (_, p) =>
      p.nonEmpty && p == p.trim && !p.contains("  ") },
      s"phrases must be non-empty, trimmed, single-spaced: $dict")
    val spark = df.sparkSession
    import spark.implicits._
    val dictDf = entries.toDF("tag", "gram")
    val lengths = entries.map(_._2.split(" ").length).distinct.sorted
    val toks = df.select(col(idCol), tokens(col(textCol)).as("_toks"))
    val grams = lengths.map { l =>
      toks.filter(size(col("_toks")) >= l)
        .select(col(idCol),
          posexplode(transform(sequence(lit(0), size(col("_toks")) - l),
            i => concat_ws(" ", slice(col("_toks"), i + 1, lit(l)))))
            .as(Seq("pos", "gram")))
    }.reduce(_ unionByName _)
    grams.join(broadcast(dictDf), "gram")
      .groupBy(col(idCol), col("tag"))
      .agg(count(lit(1)).as("n_hits"), min(col("pos").cast("long")).as("first_pos"))
  }

  /** Main-content extraction from raw HTML — the first step of every
    * web-crawl training pipeline (the trafilatura/jusText class, here as
    * the deterministic regex+line-heuristic core those tools build on):
    * strip script/style blocks, turn block-tag closes into line breaks,
    * drop every remaining tag, decode the five standard entities, then
    * keep only lines with ≥ `minTokens` tokens — the C4-style line
    * filter that removes titles, nav crumbs, and button text.
    *
    * Pure per-row projection (regexp chains + array HOFs): zero shuffle
    * at any scale. Two separate script/style passes because RE2-class
    * engines (the oracle side) have no backreferences. Returns a struct
    * (text, n_lines, n_kept) so the caller sees what the filter dropped. */
  def extractHtmlText(html: Column, minTokens: Int): Column = {
    val noScript = regexp_replace(html, "(?s)<script[^>]*>.*?</script>", " ")
    val noStyle = regexp_replace(noScript, "(?s)<style[^>]*>.*?</style>", " ")
    val blocks = regexp_replace(noStyle, "</(p|h1|h2|h3|div|li|title|tr)>", "\n")
    val noTags = regexp_replace(blocks, "<[^>]+>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&amp;" -> "&").foldLeft(noTags) {
      case (c, (e, r)) => replace(c, lit(e), lit(r))
    }
    val lines = filter(
      transform(split(decoded, "\n"), l => trim(regexp_replace(l, " +", " "))),
      l => l =!= "")
    val kept = filter(lines, l => size(split(l, " ")) >= minTokens)
    struct(
      array_join(kept, "\n").as("text"),
      size(lines).cast("long").as("n_lines"),
      size(kept).cast("long").as("n_kept"))
  }

  /** Informative-term contrast between two sub-corpora by log-odds with
    * a symmetric Dirichlet prior (Monroe / Colaresi / Quinn 2008, the
    * "Fightin' Words" statistic) — the feature-selection step behind
    * fastText-style quality/domain classifiers. ENGINE-EXACT twist: the
    * log-odds δ_w = ln[(y1+α)/(n1+α0−y1−α)] − ln[(y2+α)/(n2+α0−y2−α)]
    * is a MONOTONE function of the integer cross-ratio
    *
    *   R_w = (y1+1)·(n2+V−y2−1) / ((n1+V−y1−1)·(y2+1))      (α=1, α0=V)
    *
    * so ranking by R_w ≡ ranking by δ_w, and R_w in ppm is one
    * DECIMAL(38,0) floor-division — no ln(), nothing libm to diverge
    * (same discipline as [[bm25TopK]]'s rational idf). ratio_ppm > 10⁶
    * ⟺ the term leans class-1; < 10⁶ ⟺ class-2; the z-score
    * normalization (÷√(1/(y1+α)+1/(y2+α))) is again monotone PER EQUAL
    * COUNT PAIR only, so consumers needing the full z-statistic apply
    * it downstream to these exact counts. Decimal keeps the products
    * exact to 10^38 (n·V < 10^19 wraps int64 at ~10^9-token corpora).
    *
    * Shape: one token explode → one (term) map-side-combined aggregation
    * carrying TWO conditional counts in the same pass (never two scans),
    * + a 1-row broadcast of (n1, n2, V). Output is O(vocab), each row's
    * arithmetic row-local. Rows with a zero denominator (single-term
    * vocabulary edge) yield NULL rather than a fake ratio. */
  def logOddsTerms(docs: DataFrame, textCol: String, class1: Column): DataFrame = {
    val toks = docs.select(class1.as("_c1"), explode(tokens(col(textCol))).as("term"))
    val cnt = toks.groupBy(col("term")).agg(
      sum(when(col("_c1"), 1L).otherwise(0L)).as("y1"),
      sum(when(!col("_c1"), 1L).otherwise(0L)).as("y2"))
    val totals = cnt.agg(sum(col("y1")).as("_n1"), sum(col("y2")).as("_n2"),
      count(lit(1)).as("_v"))
    cnt.crossJoin(broadcast(totals))
      .withColumn("ratio_ppm", expr(
        """CASE WHEN (_n1 + _v - y1 - 1) > 0 AND (y2 + 1) > 0
          |THEN CAST((CAST(y1 + 1 AS DECIMAL(38,0)) * (_n2 + _v - y2 - 1) * 1000000) DIV
          |          (CAST(_n1 + _v - y1 - 1 AS DECIMAL(38,0)) * (y2 + 1)) AS BIGINT)
          |END""".stripMargin))
      .select(col("term"), col("y1"), col("y2"), col("ratio_ppm"))
  }

  /** χ² discriminative-term selection over DOCUMENT frequencies — the
    * presence/absence companion of [[logOddsTerms]] (which ranks by token
    * counts): for each term, the 2×2 contingency of (doc contains term) ×
    * (doc in class-1), scored by Pearson's χ². The classic filter-method
    * feature selector (Yang & Pedersen) for building domain/quality
    * classifiers over a corpus.
    *
    * ENGINE-EXACT: with a = class-1 docs containing the term, b = class-2
    * docs containing it, c = n1−a, d = n2−b, N = n1+n2,
    *
    *   χ² = N·(a·d − b·c)² / ((a+b)·(c+d)·(a+c)·(b+d))
    *
    * is PURE RATIONAL in doc counts — no expected-frequency floats, no
    * libm. chi2_ppm = floor(10⁶·χ²) in one DECIMAL(38,0) floor-division
    * ((a·d−b·c)² is ≤ N⁴/16, so N⁵·10⁶/16 caps the numerator: exact to
    * ~3·10⁶ docs per corpus shard; pre-aggregate per shard past that).
    * Terms contained in EVERY doc (c+d = 0) or missing a class entirely
    * (n1 = 0 or n2 = 0) have an undefined χ² and are dropped rather than
    * scored 0 — a zero denominator means "no variation to test".
    *
    * Shape: per-doc term presence is ROW-LOCAL (array_distinct before the
    * explode — never a (doc, term) distinct shuffle); one (term)
    * map-side-combined aggregation carrying both class counts in the same
    * pass; a 1-row broadcast of (n1, n2); TakeOrdered top-k. O(vocab)
    * intermediate, nothing doc-sized shuffles. */
  def chi2Terms(docs: DataFrame, textCol: String, class1: Column, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val pres = docs.select(class1.as("_c1"),
        explode(array_distinct(tokens(col(textCol)))).as("term"))
    val cnt = pres.groupBy(col("term")).agg(
      sum(when(col("_c1"), 1L).otherwise(0L)).as("df1"),
      sum(when(!col("_c1"), 1L).otherwise(0L)).as("df2"))
    val totals = docs.agg(
      sum(when(class1, 1L).otherwise(0L)).as("_n1"),
      sum(when(!class1, 1L).otherwise(0L)).as("_n2"))
    cnt.crossJoin(broadcast(totals))
      .withColumn("chi2_ppm", expr(
        """CASE WHEN (df1 + df2) > 0 AND (_n1 - df1 + _n2 - df2) > 0
          |      AND _n1 > 0 AND _n2 > 0
          |THEN CAST((CAST(_n1 + _n2 AS DECIMAL(38,0)) *
          |           (CAST(df1 AS DECIMAL(38,0)) * (_n2 - df2) -
          |            CAST(df2 AS DECIMAL(38,0)) * (_n1 - df1)) *
          |           (CAST(df1 AS DECIMAL(38,0)) * (_n2 - df2) -
          |            CAST(df2 AS DECIMAL(38,0)) * (_n1 - df1)) * 1000000) DIV
          |          (CAST(df1 + df2 AS DECIMAL(38,0)) *
          |           (_n1 - df1 + _n2 - df2) * _n1 * _n2) AS BIGINT)
          |END""".stripMargin))
      .filter(col("chi2_ppm").isNotNull)
      .select(col("term"), col("df1"), col("df2"), col("chi2_ppm"))
      .orderBy(col("chi2_ppm").desc, col("term"))
      .limit(topK)
  }

  /** Vocabulary-growth (novelty) census across ingest batches — the
    * Heaps-law curve that tells a corpus pipeline whether new data still
    * adds new language: per batch, the word-bigram occurrence volume,
    * the count of bigrams NEVER seen in any earlier batch, the running
    * distinct-bigram vocabulary, and novelty in ppm of the batch's
    * occurrences. A crawl whose novelty_ppm collapses is re-crawling
    * itself; a dedup pipeline uses the same curve to price incremental
    * batches.
    *
    * First-occurrence attribution is ONE min-aggregation over (bigram) —
    * never a batch×batch anti-join chain; the cumulative vocabulary is a
    * batch≤batch triangular self-join on the BATCH frame (|batches|²
    * rows, domain-bounded) rather than a global window, so no
    * single-partition WindowExec at any scale.
    *
    * Scale shape: bigram explode (row-local) → two map-side-combined
    * aggregations (per-bigram min-batch — the data-sized pass — and
    * per-batch occurrence counts); everything after runs on the batch
    * frame. Output: (batch, n_occ, n_new, cum_vocab, novelty_ppm)
    * ordered by batch. */
  def vocabGrowth(docs: DataFrame, batchCol: Column, textCol: String): DataFrame = {
    val bg = docs.withColumn("_toks", tokens(col(textCol)))
      .filter(size(col("_toks")) >= 2)
      .select(batchCol.as("_b"), explode(expr(
        "transform(sequence(0, size(_toks) - 2), i -> concat(_toks[i], ' ', _toks[i + 1]))"))
        .as("_bg"))
    val firstSeen = bg.groupBy(col("_bg")).agg(min(col("_b")).as("batch"))
      .groupBy(col("batch")).agg(count(lit(1)).as("n_new"))
    val occ = bg.groupBy(col("_b").as("batch")).agg(count(lit(1)).as("n_occ"))
    val withNew = occ.join(firstSeen, Seq("batch"), "left")
      .na.fill(0L, Seq("n_new"))
    val cum = withNew.select(col("batch").as("_cb"), col("n_new").as("_cn"))
    withNew.join(cum, col("_cb") <= col("batch"))
      .groupBy(col("batch"))
      .agg(max(col("n_occ")).as("n_occ"), max(col("n_new")).as("n_new"),
        sum(col("_cn")).as("cum_vocab"))
      .withColumn("novelty_ppm",
        when(col("n_occ") > 0, expr("n_new * 1000000 DIV n_occ")).otherwise(0L))
      .select(col("batch"), col("n_occ"), col("n_new"), col("cum_vocab"),
        col("novelty_ppm"))
  }

  /** Feature-hashing (hashing-trick) bucket census — the collision audit
    * for the fixed-width featurization a 100 TB bag-of-words pipeline
    * uses instead of a materialized vocabulary: every token hashes to
    * bucket = md5-prefix mod `buckets`, and this reports each bucket's
    * occupancy (occurrence count, DISTINCT colliding terms, max single
    * term share in ppm). Two map-side-combinable aggregations — a
    * (bucket, term) count (the data-sized pass) then a bucket rollup;
    * the md5 prefix is the registry's deterministic-hash idiom (first
    * 12 hex chars, replayed by DuckDB's 0x-cast). Output:
    * (bucket, n_tok, n_terms, top_term_ppm) ordered by bucket. */
  def featureHashStats(docs: DataFrame, textCol: String, buckets: Int): DataFrame = {
    require(buckets >= 2, s"buckets must be >= 2: $buckets")
    val terms = docs.select(explode(tokens(col(textCol))).as("term"))
      .withColumn("bucket",
        conv(substring(md5(col("term")), 1, 12), 16, 10).cast("long") % buckets)
    val perTerm = terms.groupBy(col("bucket"), col("term"))
      .agg(count(lit(1)).as("_n"))
    perTerm.groupBy(col("bucket"))
      .agg(sum(col("_n")).as("n_tok"),
        count(lit(1)).as("n_terms"),
        max(col("_n")).as("_mx"))
      .withColumn("top_term_ppm", expr("_mx * 1000000 DIV n_tok"))
      .select(col("bucket"), col("n_tok"), col("n_terms"), col("top_term_ppm"))
  }

  /** RAKE keyphrase extraction (Rose et al. 2010) — multi-word keyword
    * candidates for tagging/indexing where [[tfidfTopTerms]] scores
    * single tokens: text splits into candidate phrases at stopwords and
    * punctuation-bearing tokens; each word scores deg/freq (deg = Σ
    * phrase length over its phrases — co-occurrence degree including
    * itself; freq = occurrences), floored ONCE per word to ppm; a
    * phrase scores the sum of its word scores. Corpus-level: identical
    * phrase strings aggregate (n_occur), score is word-stat-determined
    * (max = the shared value). Top-k via TakeOrdered on (score desc,
    * phrase).
    *
    * Scale shape: posexplode + running delimiter-count window per doc
    * (doc-keyed — never global), one word-stat aggregation, one
    * phrase-score aggregation; word stats join back on the word key.
    * Output: (phrase, n_words, n_occur, score_ppm). */
  def rakePhrases(docs: DataFrame, idCol: String, textCol: String, topK: Int): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val stops = stopwords.flatMap(_._2)
    val pos = docs
      .select(col(idCol).as("_id"), posexplode(tokens(col(textCol))).as(Seq("_p", "_w")))
      .withColumn("_delim",
        (col("_w").isin(stops: _*) || col("_w").rlike("[^a-z0-9]") ||
          col("_w") === "").cast("long"))
    val wDoc = Window.partitionBy(col("_id")).orderBy(col("_p"))
    val phrased = pos
      .withColumn("_ph", sum(col("_delim")).over(wDoc))
      .filter(col("_delim") === 0)
    val phrases = phrased.groupBy(col("_id"), col("_ph"))
      .agg(sort_array(collect_list(struct(col("_p"), col("_w")))).as("_ws"))
      .select(col("_id"), col("_ph"),
        expr("transform(_ws, x -> x._w)").as("_words"),
        size(col("_ws")).cast("long").as("n_words"))
    val wordStats = phrases
      .select(col("n_words"), explode(col("_words")).as("_w"))
      .groupBy(col("_w"))
      .agg(count(lit(1)).as("_freq"), sum(col("n_words")).as("_deg"))
      .withColumn("_s", expr("_deg * 1000000 DIV _freq"))
    val scored = phrases
      .select(col("_id"), col("_ph"), col("n_words"),
        concat_ws(" ", col("_words")).as("phrase"),
        explode(col("_words")).as("_w"))
      .join(wordStats.select(col("_w"), col("_s")), Seq("_w"))
      .groupBy(col("_id"), col("_ph"), col("phrase"), col("n_words"))
      .agg(sum(col("_s")).as("score_ppm"))
    scored.groupBy(col("phrase"), col("n_words"))
      .agg(count(lit(1)).as("n_occur"), max(col("score_ppm")).as("score_ppm"))
      .orderBy(col("score_ppm").desc, col("phrase"))
      .limit(topK)
  }

  /** Vocabulary-richness census per group — the lexical-diversity
    * quality gate (a spammy or template-generated slice shows a
    * collapsed type-token ratio; an OCR-noise slice shows an inflated
    * hapax share): per group, token count, vocabulary size, hapax count
    * (corpus-frequency-1 terms), type-token ratio and hapax/vocab share
    * in ppm. Cost is ONE (group, term) frequency census (the same
    * shuffle any tf pass pays); the per-group rollup rides the census,
    * never the raw tokens twice. */
  def hapaxCensus(docs: DataFrame, groupCol: Column, textCol: String): DataFrame = {
    val tf = docs
      .select(groupCol.as("g"), explode(tokens(col(textCol))).as("_t"))
      .filter(length(col("_t")) > 0)
      .groupBy(col("g"), col("_t")).agg(count(lit(1)).as("_f"))
    tf.groupBy(col("g"))
      .agg(sum(col("_f")).as("n_tokens"),
        count(lit(1)).as("n_vocab"),
        sum(when(col("_f") === 1L, 1L).otherwise(0L)).as("n_hapax"))
      .withColumn("ttr_ppm",
        expr("CAST(CAST(n_vocab AS DECIMAL(38,0)) * 1000000 DIV n_tokens AS BIGINT)"))
      .withColumn("hapax_ppm",
        expr("CAST(CAST(n_hapax AS DECIMAL(38,0)) * 1000000 DIV n_vocab AS BIGINT)"))
  }

  /** Zipf-law fit per group — the power-law sanity check of a corpus
    * census (natural language shows rank-frequency slope near −1 in
    * log-log space; machine-generated or truncated corpora drift): OLS
    * slope over (x, y) = (⌊log₂ rank⌋, ⌊log₂ freq⌋), all-integer via
    * bit length (`length(bin(n)) − 1`), so the fit replays exactly in
    * any engine with a binary formatter — no libm on either side.
    *
    * Scale shape: terms are never individually ranked. x depends only
    * on the rank's log₂ bucket, so the fit needs just the per-group
    * (freq → n_terms) CLASS census (O(√tokens) rows by Zipf itself):
    * a freq class ordered by freq desc occupies the contiguous rank
    * range [hi−nt+1, hi] (any within-class tiebreak permutes positions
    * inside the range, leaving every per-class rank multiset — and so
    * every sum below — unchanged), and the class×log-bucket overlap
    * counts are closed-form. The only window runs over the class
    * census, not the vocabulary. Output: (g, n_terms, sum_x, sum_y,
    * sum_xy, sum_xx, slope_ppm). */
  def zipfFit(docs: DataFrame, groupCol: Column, textCol: String): DataFrame = {
    val tf = docs
      .select(groupCol.as("g"), explode(tokens(col(textCol))).as("_t"))
      .filter(length(col("_t")) > 0)
      .groupBy(col("g"), col("_t")).agg(count(lit(1)).as("_f"))
    val classes = tf.groupBy(col("g"), col("_f")).agg(count(lit(1)).as("_nt"))
    val w = Window.partitionBy(col("g")).orderBy(col("_f").desc)
    val ranged = classes
      .withColumn("_hi", sum(col("_nt")).over(w))
      .withColumn("_lo", col("_hi") - col("_nt") + 1L)
    def ilog2(c: Column): Column = (length(bin(c)) - 1).cast("long")
    val buckets = ranged
      .withColumn("_y", ilog2(col("_f")))
      .withColumn("_k", explode(sequence(ilog2(col("_lo")), ilog2(col("_hi")))))
      // ranks of this class inside log-bucket k: [max(lo, 2^k), min(hi, 2^(k+1)-1)]
      .withColumn("_cnt",
        least(col("_hi"), expr("shiftleft(CAST(1 AS BIGINT), CAST(_k AS INT) + 1) - 1")) -
          greatest(col("_lo"), expr("shiftleft(CAST(1 AS BIGINT), CAST(_k AS INT))")) + 1L)
    buckets.groupBy(col("g"))
      .agg(sum(col("_cnt")).as("n_terms"),
        sum(col("_cnt") * col("_k")).as("sum_x"),
        sum(col("_cnt") * col("_y")).as("sum_y"),
        sum(col("_cnt") * col("_k") * col("_y")).as("sum_xy"),
        sum(col("_cnt") * col("_k") * col("_k")).as("sum_xx"))
      .withColumn("slope_ppm",
        when(col("n_terms") * col("sum_xx") - col("sum_x") * col("sum_x") =!= 0L,
          expr("""CAST((CAST(n_terms AS DECIMAL(38,0)) * sum_xy - CAST(sum_x AS DECIMAL(38,0)) * sum_y)
                 |  * 1000000
                 |  DIV (CAST(n_terms AS DECIMAL(38,0)) * sum_xx - CAST(sum_x AS DECIMAL(38,0)) * sum_x)
                 |  AS BIGINT)""".stripMargin)))
  }
}
