package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over an embedding column (`Array[Float]`):
  * exact brute-force cosine top-k against a small broadcast query set, and
  * an LSH-bucketed (random-hyperplane) approximate variant for scale.
  *
  * All vector math is `zip_with`/`aggregate` higher-order functions in
  * double precision — codegen'd, no UDFs, no shuffle for the per-row part.
  *
  * Scale notes:
  *  - topKExact is a BroadcastNestedLoopJoin against the tiny query set
  *    (q rows), NOT an all-pairs crossJoin of the corpus with itself:
  *    cost is q·N row-local dot products. Top-k is two-phase (shard-local
  *    rank, then rank over the surviving shards·k rows) so no single task
  *    ever sorts a whole query's N candidates.
  *  - annTopK prunes the corpus to rows sharing an LSH signature band
  *    with a query: the join is a shuffle on the band key over a
  *    candidate set ≪ N; the plan contains no full-corpus crossJoin.
  */
object Similarity {

  /** Σ aᵢ·bᵢ in double precision, sequential fold in array order (bit-stable
    * across engines that fold the same way). Native codegen kernel
    * (graft.functions.DotProductExpr) — the declarative HOF chain below
    * evaluates its lambda interpreted per element; both produce identical
    * doubles (differential-tested in SimilaritySpec). */
  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.graftbridge
    graftbridge.columnOf(graft.functions.DotProductExpr(
      graftbridge.expressionOf(a), graftbridge.expressionOf(b)))
  }

  /** The declarative zip_with/aggregate form of [[dot]] — kept as the
    * differential-test reference for the native kernel. */
  def dotDeclarative(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2norm(a) * l2norm(b))

  /** Cosine in integer parts-per-million: the FP-free comparison and
    * ranking currency for oracle-checked top-k. */
  def cosinePpm(a: Column, b: Column): Column =
    floor(cosine(a, b) * 1e6).cast("long")

  /** Exact top-k per query vector. Output: one row per (query, rank≤k)
    * with columns qIdCol, rank, idCol, sim_ppm. */
  def topKExact(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      shards: Int = 32): DataFrame = {
    // precompute each side's norm ONCE (a per-pair cosine would fold the
    // corpus vector q extra times per row)
    val corpusN = corpus.withColumn("_n", l2norm(col(vecCol)))
    val queriesN = queries.withColumn("_qn", l2norm(col(qVecCol)))
    val scored = corpusN
      .crossJoin(broadcast(queriesN))
      .filter(col(idCol) =!= col(qIdCol)) // exclude self-match
      .withColumn("sim_ppm",
        floor(dot(col(vecCol), col(qVecCol)) / (col("_n") * col("_qn")) * 1e6).cast("long"))
      .select(col(qIdCol), col(idCol), col("sim_ppm"))
    val shard = pmod(xxhash64(col(idCol)), lit(shards))
    val w1 = Window.partitionBy(col(qIdCol), shard)
      .orderBy(col("sim_ppm").desc, col(idCol))
    val partial = scored
      .withColumn("_r", row_number().over(w1))
      .filter(col("_r") <= k)
      .drop("_r")
    val w2 = Window.partitionBy(col(qIdCol)).orderBy(col("sim_ppm").desc, col(idCol))
    partial
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("sim_ppm"))
  }

  /** Mutual nearest-neighbor pairs — the highest-precision tier of
    * embedding dedup/ER (a one-directional nearest neighbor is a
    * candidate; MUTUAL top-1 is the classic high-precision match rule
    * bitext mining and record linkage both use): pairs (a, b), a < b,
    * where each is the other's exact top-1 cosine neighbor
    * (ties → smaller id, self excluded). Brute |corpus|² row-local dots
    * through [[topKExact]]'s two-phase shard rank — since round 12 this
    * is the ORACLE/recall-reference path only; the registered
    * production path is [[mutualNnPairsAnn]] (IVF ∪ multi-probe-LSH
    * bucket candidates, unchanged mutual filter), hash-checked equal
    * to this frame at every SF. Output: (id_a, id_b, sim_ppm). */
  def mutualNnPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      shards: Int = 32): DataFrame = {
    val q = corpus.select(col(idCol).as("_mq_id"), col(vecCol).as("_mq_vec"))
    val nn = topKExact(corpus, q, idCol, vecCol, "_mq_id", "_mq_vec", k = 1, shards)
      .select(col("_mq_id").as("src"), col(idCol).as("dst"), col("sim_ppm"))
    nn.as("a").join(nn.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src") &&
          col("a.src") < col("a.dst"))
      .select(col("a.src").as("id_a"), col("a.dst").as("id_b"),
        col("a.sim_ppm").as("sim_ppm"))
  }

  /** [[mutualNnPairs]] on ANN CANDIDATES — the registered production
    * path (the brute corpus² scorer above becomes the ORACLE, the
    * q_knn_classify r9/r10 swap applied to the last registered
    * all-pairs query): per-side top-1 candidates come from the union of
    * two bucket-join generators with complementary failure modes —
    * the IVF inverted file (every vector probes its `nprobe` nearest
    * centroid buckets against the staged (id, cid) postings index;
    * misses a neighbor only when it hides past nprobe buckets) and
    * random-hyperplane LSH banding (signature block-key self-join;
    * misses only when all `bands` band keys differ) — verified by
    * exact cosine within candidates, per-side argmax, and the mutual
    * self-join filter UNCHANGED from the brute path.
    *
    * RECALL CONTRACT (the [[knnClassifyAnn]] discipline): the result
    * equals the brute mutual-NN frame iff each side of every mutual
    * pair finds its true top-1 in the candidate set AND no vector whose
    * true top-1 is missed forms a spurious coherent pair; on the
    * benchmark corpus that equality is hash-checked against the brute
    * SQL oracle at every SF, and the default operating point below is
    * the cheapest sweep point with zero pair mismatches at 3 SFs
    * (graft.MnnProbe, round 12): nprobe=2 of 8 IVF buckets + 16-bit/
    * 8-band LSH WITH Hamming-1 multi-probe — the multi-probe keys are
    * what close the last 1-spurious-pair gap that even nprobe=7
    * plain banding left (probe table in BUILDER_NOTES). Near-random
    * embeddings are ANN's adversarial case, so the point is still
    * dense in candidate volume; a clustered production corpus runs
    * sparse at the recall the q_ann_recall_* twins measure.
    *
    * Scale shape: no corpus×corpus stage anywhere — IVF candidates ride
    * a cid bucket join against the staged postings, LSH candidates ride
    * band-bucket self-joins (skew-capped), vectors join back only for
    * candidate-sized verify, and top-1 is one map-side-combinable
    * argmax. Output: (id_a, id_b, sim_ppm), id_a < id_b. */
  def mutualNnPairsAnn(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int = 8,
      nprobe: Int = 2,
      nbits: Int = 16,
      bands: Int = 8,
      maxBucket: Int = 100000,
      multiProbe: Boolean = true,
      centroids: Option[DataFrame] = None): DataFrame = {
    val corpusN = corpus.select(col(idCol), col(vecCol))
      .withColumn("_n", l2norm(col(vecCol)))
    mutualFromCandidates(
      annMutualCandidates(corpus, idCol, vecCol, nCentroids, nprobe, nbits,
        bands, maxBucket, multiProbe, centroids),
      corpusN, idCol, vecCol)
  }

  /** The candidate stream of [[mutualNnPairsAnn]] (IVF bucket join ∪
    * multi-probe LSH band join), exposed for stage-level cost probes. */
  private[graft] def annMutualCandidates(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      nCentroids: Int,
      nprobe: Int,
      nbits: Int,
      bands: Int,
      maxBucket: Int,
      multiProbe: Boolean,
      centroids: Option[DataFrame]): DataFrame = {
    // bands = 0 => IVF-ONLY (no signature/band stage at all): the sparse
    // operating point for a clustered corpus, where full-recall LSH is
    // structurally quadratic — a (nbits, bands) config has at most
    // bands * 2^(nbits/bands) distinct band keys, so bucket sizes grow
    // linearly with n and the self-join quadratically; the 5x probe
    // measured 41x shuffle with the belt on vs ~5x IVF-only. `centroids`
    // injects an externally-seeded quantizer (the design-sample check
    // seeds from the full corpus so id-residue samples keep all seeds).
    val cent = centroids.getOrElse(ivfCentroids(corpus, idCol, vecCol, nCentroids))
    val corpusN = corpus.select(col(idCol), col(vecCol))
      .withColumn("_n", l2norm(col(vecCol)))
    // IVF side: staged compact postings; every vector (as query) probes
    // its nprobe nearest centroid buckets — a cid-keyed bucket join
    val postings = graft.store.Staging.stage(
      ivfAssign(corpusN, cent, idCol, vecCol).select(col(idCol), col("cid")),
      "mnn_postings")
    // nprobe=1 probe selection IS the assignment (same argmax, same
    // smaller-cid tie-break), so the staged postings serve both sides
    // and the n x nC probe-ranking window disappears — the r13 5x probe
    // traced its shuffle growth to exactly that window (n grows AND
    // clusterCount(n) grows, so n*nC rows is the superlinear term)
    val probes =
      if (nprobe == 1) postings.select(col(idCol).as("src"), col("cid"))
      else {
        val wp = Window.partitionBy(col(idCol)).orderBy(col("_qsim").desc, col("cid"))
        corpusN.crossJoin(broadcast(cent))
          .withColumn("_qsim", centSimPpm(col(vecCol), col("_n")))
          .withColumn("_pr", row_number().over(wp))
          .filter(col("_pr") <= nprobe)
          .select(col(idCol).as("src"), col("cid"))
      }
    val ivfCand = probes
      .join(postings.select(col(idCol).as("dst"), col("cid")), Seq("cid"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst"))
    // LSH side: band-bucket self-join over the staged signature frame,
    // BOTH directions (src, dst) — each side generates its own top-1
    val lshCand: Option[DataFrame] = if (bands == 0) None else Some {
      val sigs = graft.store.Staging.stage(
        rhpSignatures(corpus, idCol, col(vecCol), nbits), "mnn_sigs")
      val bandRows = sigs.select(col(idCol),
          explode(Dedup.simhashBlockKeys(col("sig"), nbits, bands)).as("_band"))
        .withColumn("_bn", count(lit(1)).over(Window.partitionBy(col("_band"))))
        .filter(col("_bn") <= maxBucket)
        .drop("_bn")
      // multiProbe widens the SRC side's keys to every Hamming-1 block
      // perturbation ([[multiProbeBlockKeys]]): a pair is then found when
      // SOME band differs by ≤ 1 bit instead of none — the dominant
      // recall loss of plain banding — at probe-key cost (width+1 keys
      // per block on one side), not index-size cost.
      val srcRows =
        if (!multiProbe) bandRows.select(col(idCol).as("src"), col("_band"))
        else sigs.select(col(idCol).as("src"),
          explode(multiProbeBlockKeys(col("sig"), nbits, bands)).as("_band"))
      srcRows
        .join(bandRows.select(col(idCol).as("dst"), col("_band")), Seq("_band"))
        .filter(col("src") =!= col("dst"))
        .select(col("src"), col("dst"))
    }
    // NO distinct, and an explicit src exchange (r12 probe finding): a
    // (src, dst) pair found by several band keys scores once in an
    // argmax anyway, so the distinct only built a corpus-scale hash map
    // — inside the same skewed task that generated the pairs, because a
    // band bucket is ONE join key and the vector joins below broadcast
    // (no exchange of their own). At a dense operating point that left
    // every verify dot product of a bucket on one core (a 5x probe
    // corpus pinned one task for 50+ min). Repartitioning the slim
    // (src, dst) stream by src spreads the verify across the cluster
    // and the argmax reuses the same partitioning.
    lshCand.fold(ivfCand)(ivfCand.unionByName)
  }

  /** Exact-cosine verify + per-side argmax + mutual filter over a slim
    * (src, dst) candidate stream — the shared tail of every mutual-NN
    * candidate generator ([[mutualNnPairsAnn]], [[mutualNnPairsPq]]).
    * Repartitions the candidate stream by src first (r12 probe finding:
    * the generators' bucket joins otherwise leave a skewed bucket's
    * verify dot products on one core); verify joins touch vectors only
    * at candidate cardinality; top-1 is one map-side-combinable argmax
    * with the brute path's tie rule (ties → smaller dst). */
  private def mutualFromCandidates(
      candidates: DataFrame,
      corpusN: DataFrame, // (idCol, vecCol, _n)
      idCol: String,
      vecCol: String): DataFrame = {
    // DEDUP the stream before the verify (r15 optimization): the
    // multi-probe band join emits each (src, dst) through every matching
    // band key — measured 24.9M candidate rows for a 2000-vector corpus
    // (6.2x the full n² cross product), all previously shuffled by the
    // bare repartition and dot-product-verified per copy. distinct() is
    // result-identical (argmax ignores multiplicity, same tie rule) and
    // strictly better-shaped: the map-side partial aggregate dedupes
    // INSIDE the generator tasks, so the exchange ships unique pairs
    // (<= n²) hashed on (src, dst) — which both spreads a skewed
    // bucket's pairs like the old repartition("src") did (r12 finding)
    // and caps verify work at one dot product per unique pair
    // (guide §2.3 aggregate-before-shuffle, §2.4).
    val cands = candidates.distinct()
    // exact verify on candidates only; top-1 = one map-side argmax
    // (ties → smaller dst, matching the brute row_number order)
    val top1 = cands
      .join(corpusN.select(col(idCol).as("src"), col(vecCol).as("_vs"),
        col("_n").as("_ns")), Seq("src"))
      .join(corpusN.select(col(idCol).as("dst"), col(vecCol).as("_vd"),
        col("_n").as("_nd")), Seq("dst"))
      .withColumn("sim_ppm",
        floor(dot(col("_vs"), col("_vd")) / (col("_ns") * col("_nd")) * 1e6).cast("long"))
      .groupBy(col("src"))
      .agg(max(struct(col("sim_ppm").as("s"), (-col("dst")).as("nd"))).as("_m"))
      .select(col("src"), (-col("_m.nd")).as("dst"), col("_m.s").as("sim_ppm"))
    // the mutual filter — byte-identical to the brute path's
    top1.as("a").join(top1.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src") &&
          col("a.src") < col("a.dst"))
      .select(col("a.src").as("id_a"), col("a.dst").as("id_b"),
        col("a.sim_ppm").as("sim_ppm"))
  }

  /** EXPLICIT dense mutual-NN scan — the correct degenerate for the
    * tuned ladder's fallback regime (r15 optimization): when no
    * sub-quadratic candidate generator earned its recall (IVF parity
    * failed, no full-recall belt priced, PQ refuted), the corpus is in
    * ANN's adversarial near-random regime where ANY banding emits a
    * candidate stream ≥ the cross product — measured 24.9M candidate
    * rows against n² = 4M at sf0.1 (6.2x), i.e. the old "dense operating
    * point" belt cost MORE than brute in both compute and shuffle at
    * every scale. This path does what the regime physically requires,
    * honestly: one broadcast pass (n² dots row-local, compute n²/p per
    * task), ONE map-side-combinable argmax per side (shuffle O(n) rows —
    * where the belt shuffled 6n² and [[mutualNnPairs]]'s oracle windows
    * shuffle n²), then the byte-identical mutual filter. Same
    * tie-breaking, same floor(dot/(n·n)·1e6) expression as the brute
    * oracle — provably the identical frame, so the fallback's recall
    * contract holds STRUCTURALLY instead of by per-SF sweep. The
    * broadcast bound (8 GB) is the documented dense-regime policy
    * limit, exactly as in [[topKExact]]. */
  private[graft] def mutualNnPairsDense(
      corpus: DataFrame,
      idCol: String,
      vecCol: String): DataFrame = {
    val corpusN = corpus.select(col(idCol), col(vecCol))
      .withColumn("_n", l2norm(col(vecCol)))
    val q = broadcast(corpusN.select(col(idCol).as("_qid"),
      col(vecCol).as("_qv"), col("_n").as("_qn")))
    val top1 = corpusN.crossJoin(q)
      .filter(col(idCol) =!= col("_qid"))
      .withColumn("sim_ppm",
        floor(dot(col(vecCol), col("_qv")) / (col("_n") * col("_qn")) * 1e6)
          .cast("long"))
      .groupBy(col("_qid").as("src"))
      .agg(max(struct(col("sim_ppm").as("s"), (-col(idCol)).as("nd"))).as("_m"))
      .select(col("src"), (-col("_m.nd")).as("dst"), col("_m.s").as("sim_ppm"))
    top1.as("a").join(top1.as("b"),
        col("a.src") === col("b.dst") && col("a.dst") === col("b.src") &&
          col("a.src") < col("a.dst"))
      .select(col("a.src").as("id_a"), col("a.dst").as("id_b"),
        col("a.sim_ppm").as("sim_ppm"))
  }

  /** [[mutualNnPairs]] on PQ ASYMMETRIC-DISTANCE candidates (VERDICT r14
    * Next #4) — the dense regime's cheap candidate generator: the corpus
    * is represented by 8-byte PQ codes (trained once per corpus and
    * cached by [[Clustering.pqEncode]]), every vector scans the
    * BROADCAST code frame row-locally and keeps its ADC top-`m`, and
    * only those n·m slim (src, dst) pairs reach a shuffle (bounded
    * typed aggregation — see [[Clustering.pqAdcCandidates]]). Compute
    * stays n²/p per task — the dense regime's physics on near-random
    * embeddings — but the candidate stage ships codes, never the
    * vector-width n² stream the 16/8 multi-probe belt shuffles at this
    * operating point (the r13/r14 CandProbe 24.4x-at-5x contract).
    * Exact-cosine verify + the mutual filter are [[mutualFromCandidates]]
    * — byte-identical to every other path. Recall is NOT structural
    * (quantization can demote a true top-1 past rank m): the point must
    * be EARNED per corpus by [[mutualNnTuned]]'s sample parity check at
    * half the candidate budget (m/2) before this path runs. */
  def mutualNnPairsPq(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      subspaces: Int = 8,
      kCodes: Int = 16,
      iters: Int = 2,
      m: Int = 16): DataFrame = {
    val (enc, books) = Clustering.pqEncode(
      corpus, idCol, vecCol, dims, subspaces, kCodes, iters)
    val qq = corpus.select(col(idCol),
      Clustering.quantizeMils(col(vecCol)).as("_qv"))
    val corpusN = corpus.select(col(idCol), col(vecCol))
      .withColumn("_n", l2norm(col(vecCol)))
    val cands = Clustering.pqAdcCandidates(enc, qq, idCol, books, dims, m)
    mutualFromCandidates(cands, corpusN, idCol, vecCol)
  }

  /** Random-hyperplane signatures: bit j = sign of Σᵢ vᵢ·hᵢⱼ where the
    * plane coefficients hᵢⱼ = ±1 derive from xxhash64(j, i).
    * Deterministic, data-independent (no training pass — unlike IVF).
    * Distributed shape: posexplode the vector → nbits codegen'd projection
    * sums per doc (map-side combined) → bit-pack; per-row HOF lambdas
    * would run interpreted. Output: df + sig column. */
  def rhpSignatures(df: DataFrame, idCol: String, vec: Column, nbits: Int): DataFrame = {
    val projs = (0 until nbits).map { j =>
      sum(col("_v").cast("double") *
        when(xxhash64(lit(j), col("_i")) > 0, 1.0).otherwise(-1.0)).as(s"_p$j")
    }
    val pack = (0 until nbits).foldLeft(lit(0L)) { (acc, j) =>
      shiftleft(acc, 1) + when(col(s"_p$j") > 0, 1L).otherwise(0L)
    }
    df.repartition(col(idCol))
      .select(col(idCol), posexplode(vec))
      .withColumnRenamed("pos", "_i")
      .withColumnRenamed("col", "_v")
      .groupBy(col(idCol))
      .agg(projs.head, projs.tail: _*)
      .select(col(idCol), pack.as("sig"))
  }

  /** Per-vector int8 quantization — the storage path for embedding
    * corpora at scale (4× smaller than float32, 8× than float64).
    * q_i = floor(x_i / maxabs · 127) with the per-vector maxabs kept as
    * the dequant scale. `maxabs` MUST be a bound column (withColumn), not
    * an expression — interpreted HOF lambdas re-evaluate captures per
    * element. */
  def vecMaxAbs(vec: Column): Column =
    array_max(transform(vec, x => abs(x.cast("double"))))

  def int8Quantize(vec: Column, maxabs: Column): Column =
    transform(vec, x => floor(x.cast("double") / maxabs * lit(127.0)).cast("long"))

  /** Reconstruction error of the quantized vector in ppm of total
    * magnitude: Σ|x_i − q_i·maxabs/127| / Σ|x_i| · 1e6. */
  def int8ErrPpm(vec: Column, quant: Column, maxabs: Column): Column = {
    val errSum = aggregate(
      zip_with(vec, quant, (x, q) => abs(x.cast("double") - q * maxabs / lit(127.0))),
      lit(0.0), (a, e) => a + e)
    val absSum = aggregate(
      transform(vec, x => abs(x.cast("double"))),
      lit(0.0), (a, e) => a + e)
    floor(errSum / absSum * 1e6).cast("long")
  }

  /** md5-derived ±1 plane coefficients — same signatures are computable in
    * an external SQL engine (oracle parity); the xxhash64 family above is
    * the faster production default. Coefficient h_ij = sign of the first
    * md5 nibble of "j:i".
    *
    * h_ij depends only on (j, i) — it is DATA-INDEPENDENT — so the matrix
    * is computed once on the driver and inlined as array literals: the
    * per-row work is an O(1) array lookup instead of an md5 + substring +
    * ascii chain per (row, bit), which at a billion 64-dim vectors would
    * be 10¹² runtime md5 calls for a constant matrix. Values are
    * bit-identical to the SQL oracle's md5 (first hex nibble ≥ '8' ⟺
    * first digest byte ≥ 0x80). Supports vectors up to 1024 dims
    * (element_at past that throws under ANSI — loudly, not wrongly). */
  def rhpSignaturesMd5(df: DataFrame, idCol: String, vec: Column, nbits: Int): DataFrame = {
    val maxDim = 1024
    def coefRow(j: Int): Seq[Double] = (0 until maxDim).map { i =>
      val b = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0)
      if ((b & 0xFF) >= 0x80) 1.0 else -1.0
    }
    val projs = (0 until nbits).map { j =>
      sum(col("_v").cast("double") *
        element_at(typedlit(coefRow(j)), col("_i").cast("int") + 1)).as(s"_p$j")
    }
    val pack = (0 until nbits).foldLeft(lit(0L)) { (acc, j) =>
      shiftleft(acc, 1) + when(col(s"_p$j") > 0, 1L).otherwise(0L)
    }
    df.repartition(col(idCol))
      .select(col(idCol), posexplode(vec))
      .withColumnRenamed("pos", "_i")
      .withColumnRenamed("col", "_v")
      .groupBy(col(idCol))
      .agg(projs.head, projs.tail: _*)
      .select(col(idCol), pack.as("sig"))
  }

  /** IVF-style (inverted-file) approximate top-k — the data-DEPENDENT
    * coarse-quantizer scale path, complementing the data-independent
    * random-hyperplane LSH above. Every corpus vector is assigned to its
    * nearest centroid (the inverted file); a query probes only its
    * `nprobe` nearest centroid buckets and verifies exact cosine within
    * them.
    *
    * Centroids are seeded deterministically from the corpus rows with
    * id < nCentroids rather than a k-means loop: at 100 TB the quantizer
    * is trained offline on a sample anyway, and seeding keeps every
    * stage reproducible in plain SQL — like the md5 LSH family, the
    * whole approximate pipeline is oracle-checked end-to-end, and the
    * recall loss of the cheaper quantizer is measurable the same way as
    * q_ann_recall. Tie-breaks: assignment and probe prefer the SMALLER
    * centroid id on equal similarity (max(struct(sim, -cid))).
    *
    * Scale shapes: assignment is a broadcast of C centroid rows against
    * the corpus with a map-side-combined per-id argmax — corpus vectors
    * never shuffle to get assigned; search shuffles only the candidate
    * (cid-bucket ⋈ probe) rows. No full-corpus crossJoin (asserted in
    * SimilaritySpec). */
  def ivfTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      nCentroids: Int = 8,
      nprobe: Int = 2): DataFrame = {
    val cent = ivfCentroids(corpus, idCol, vecCol, nCentroids)
    // inverted file: per-id argmax over the C broadcast centroids; the
    // (id, vec, norm) grouping keys ride through the map-side combine so
    // no join-back is needed for the verify phase
    val corpusN = corpus.select(col(idCol), col(vecCol)).withColumn("_n", l2norm(col(vecCol)))
    val assigned = ivfAssign(corpusN, cent, idCol, vecCol)
    ivfSearch(assigned, cent, queries, idCol, vecCol, qIdCol, qVecCol, k, nprobe)
  }

  /** FILTERED ANN search with the pre-filter RECALL CONTRACT (VERDICT
    * r14 Next #8): top-k over only the vectors satisfying `pred`, on
    * the inverted file. Two decisions make the pre-filter path sound
    * under selective predicates:
    *
    *  1. The quantizer stays FULL-CORPUS (centroid seeds and probe
    *     ranking never see the predicate) — filtering the quantizer
    *     itself would re-shape buckets per predicate and orphan
    *     survivor clusters (and make every filter a retrain at 100 TB).
    *     Only the POSTINGS are filtered, which at scale is a pushed
    *     predicate on the postings index scan.
    *  2. nprobe WIDENS inversely with the measured survivor fraction:
    *     nprobeEff = min(nC, nprobe · ceil(total / survivors)) — a
    *     predicate keeping 1/s of the corpus thins every probed bucket
    *     ~s×, so holding the EXPECTED surviving-candidate count needs
    *     s× the buckets. At the cap (nprobeEff = nC) the probe set
    *     covers every bucket and the search is EXACT over survivors —
    *     the correct degenerate for highly selective predicates, where
    *     the survivor set is small enough to scan outright. Without the
    *     widening, a fixed nprobe inspects ~1/s the candidates and
    *     recall decays with selectivity (measured by
    *     q_ann_filtered_selective's naive-vs-contract census).
    *
    * The widening derives from two count aggregates (one job) —
    * statistics a production table already has. `widen` overrides the
    * derived factor (widen = 1 reproduces the naive fixed-nprobe path
    * the census prices). */
  def annFilteredTopK(
      corpus: DataFrame,
      pred: Column,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      nCentroids: Int = 8,
      nprobe: Int = 2,
      widen: Option[Long] = None): DataFrame = {
    val cent = ivfCentroids(corpus, idCol, vecCol, nCentroids)
    val factor = widen.getOrElse {
      val r = corpus.agg(count(lit(1)).as("n"),
        count(when(pred, lit(1))).as("s")).head()
      val (n, s) = (r.getLong(0), r.getLong(1))
      require(s > 0, "annFilteredTopK: predicate keeps no vectors")
      (n + s - 1) / s
    }
    val nprobeEff = math.min(nCentroids.toLong, nprobe * factor).toInt
    val corpusN = corpus.filter(pred).select(col(idCol), col(vecCol))
      .withColumn("_n", l2norm(col(vecCol)))
    val assigned = ivfAssign(corpusN, cent, idCol, vecCol)
    ivfSearch(assigned, cent, queries, idCol, vecCol, qIdCol, qVecCol,
      k, nprobeEff)
  }


  // --------- clustered-embedding fixture + ANN operating-point tuning ---
  // (VERDICT r12 Next #3: price the ANN SPARSE regime — the benchmark's
  // near-random embeddings are ANN's adversarial case, so the dense
  // q_mutual_nn operating point proves recall machinery but not the
  // sparse physics a production embedding corpus runs at. The fixture
  // below PLANTS cluster structure deterministically in BOTH engines;
  // the clustered twins then derive their operating point from a design
  // table instead of hardcoded defaults, and ScaleProbe prices the 5x
  // shuffle growth of the sparse regime.)

  /** Clusters for an n-vector corpus: bounded cluster SIZE (~256), not
    * bounded cluster count — the property that makes a clustered corpus
    * ANN-sparse at any scale (bucket-join cost is sum of cluster sizes
    * squared = n * 256, linear in n; a FIXED cluster count would be
    * n^2 / C, quadratic). Capped at 256 clusters by the inlined center
    * matrix (the testdata + 5x-replica range; a production fixture
    * passes nClusters explicitly). */
  def clusterCount(n: Long): Int =
    math.min(256L, math.max(8L, n / 256L)).toInt

  /** Derive a CLUSTERED twin of an embedding table: vector i becomes
    * center(i % nClusters) + eps * vector_i, where center(c) is the
    * deterministic Rademacher (+-1 per dim) vertex with sign = first md5
    * nibble of "ctr:c:d" (the [[rhpSignaturesMd5]] coefficient trick, so
    * an external SQL engine derives the SAME vectors bit-for-bit:
    * ascii(substr(md5('ctr:' || c || ':' || d), 1, 1)) >= 56). With
    * 64-dim centers of norm 8 and eps = 0.25, within-cluster cosine sits
    * ~0.9 and cross-cluster ~|0.12| — the separated regime SemDeDup-
    * style corpora exhibit. The center matrix is data-independent and
    * inlined as a literal (nClusters x 64 doubles), so the per-row cost
    * is an array lookup, not an md5 chain; dims beyond 64 throw loudly
    * under ANSI (the rhpSignaturesMd5 honesty contract).
    *
    * `nClusters <= 0` derives [[clusterCount]] from one corpus count —
    * a bounded driver scalar, mirrored by the oracle's scalar subquery.
    * Output: (idCol, vecCol as array<double>, cluster). */
  def clusteredEmbeddings(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      nClusters: Int = -1,
      eps: Double = 0.25): DataFrame = {
    val nC = if (nClusters > 0) nClusters else clusterCount(emb.count())
    require(nC <= 256, s"inlined center matrix caps at 256 clusters: $nC")
    val maxDim = 64
    val centers: Seq[Seq[Double]] = (0 until nC).map { c =>
      (0 until maxDim).map { d =>
        val b = java.security.MessageDigest.getInstance("MD5")
          .digest(s"ctr:$c:$d".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0)
        if ((b & 0xFF) >= 0x80) 1.0 else -1.0
      }
    }
    val cluster = pmod(col(idCol), lit(nC.toLong))
    emb.select(
      col(idCol),
      transform(col(vecCol), (x, d) =>
        element_at(
          element_at(typedlit(centers), cluster.cast("int") + 1),
          d + 1) + lit(eps) * x.cast("double")).as(vecCol),
      cluster.as("cluster"))
  }

  /** Random-hyperplane LSH DESIGN TABLE — [[graft.operators.Dedup.lshTuning]]
    * for the embedding family: per (nbits, bands) config, the candidate
    * count of the band self-join and how many of the corpus's true
    * >= thresholdPpm cosine pairs the bands find. The caller passes a
    * bounded DESIGN SAMPLE (all-pairs truth is computed on it — this is
    * the tuning table, never a production path; at 100 TB the sample is
    * the same 10^4-vector draw the quantizer trains on). md5 signatures,
    * so the whole table replays in the SQL oracle.
    * Output per config: (nbits, bands, n_candidates, n_true, n_found,
    * recall_ppm, precision_ppm); recall/precision null when the
    * denominator is 0. */
  def rhpTuning(
      sample: DataFrame,
      idCol: String,
      vecCol: String,
      configs: Seq[(Int, Int)],
      thresholdPpm: Long): DataFrame = {
    require(configs.nonEmpty && configs.forall { case (nb, b) =>
      nb > 0 && b > 0 && nb % b == 0 && nb <= 64 },
      s"each (nbits, bands) needs bands | nbits <= 64: $configs")
    val ids = sample.select(col(idCol), col(vecCol))
    val truth = graft.store.Staging.stage(
      ids.as("a").join(ids.as("b"), col(s"a.$idCol") < col(s"b.$idCol"))
        .select(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"),
          cosinePpm(col(s"a.$vecCol"), col(s"b.$vecCol")).as("sim_ppm"))
        .filter(col("sim_ppm") >= thresholdPpm)
        .select(col("id_a"), col("id_b")),
      "rhp_tune_truth")
    val nTrue = truth.agg(count(lit(1)).as("n_true"))
    val frames = configs.map { case (nb, b) =>
      val sigs = rhpSignaturesMd5(ids, idCol, col(vecCol), nb)
      val bandRows = sigs.select(col(idCol),
        explode(Dedup.simhashBlockKeys(col("sig"), nb, b)).as("_k"))
      val cand = bandRows.as("x")
        .join(bandRows.as("y"),
          col("x._k") === col("y._k") && col(s"x.$idCol") < col(s"y.$idCol"))
        .select(col(s"x.$idCol").as("id_a"), col(s"y.$idCol").as("id_b"))
        .distinct()
      cand.join(truth.withColumn("_t", lit(1L)), Seq("id_a", "id_b"), "left")
        .agg(count(lit(1)).as("n_candidates"),
          coalesce(sum(col("_t")), lit(0L)).as("n_found"))
        .select(lit(nb.toLong).as("nbits"), lit(b.toLong).as("bands"),
          col("n_candidates"), col("n_found"))
    }
    frames.reduce(_.unionByName(_))
      .crossJoin(broadcast(nTrue))
      .withColumn("recall_ppm",
        when(col("n_true") > 0L,
          expr("CAST(CAST(n_found AS DECIMAL(38,0)) * 1000000 DIV n_true AS BIGINT)")))
      .withColumn("precision_ppm",
        when(col("n_candidates") > 0L,
          expr("CAST(CAST(n_found AS DECIMAL(38,0)) * 1000000 DIV n_candidates AS BIGINT)")))
      .select(col("nbits"), col("bands"), col("n_candidates"), col("n_true"),
        col("n_found"), col("recall_ppm"), col("precision_ppm"))
  }

  /** [[mutualNnPairsAnn]] at a SPARSE operating point DERIVED from
    * design-sample measurements instead of the hardcoded dense defaults
    * (VERDICT r12 Next #3). Two measured decisions, both on an
    * ABSOLUTELY bounded sample (id % max(4, n/500) == 1, so the design
    * cost is fixed ~500 vectors at any corpus size — the same draw a
    * production quantizer trains on):
    *
    *  1. IVF sufficiency: brute mutual top-1 pairs on the sample vs the
    *     IVF-only candidate path (nprobe=1 over [[clusterCount]]
    *     centroids seeded from the FULL corpus). Equal => the corpus
    *     run is IVF-ONLY — on a clustered corpus the planted structure
    *     IS the inverted file, candidate volume is
    *     sum-of-cluster-sizes squared (linear in n at bounded cluster
    *     size), and the LSH belt is OFF, because full-recall LSH is
    *     structurally quadratic: a (nbits, bands) config has at most
    *     bands * 2^(nbits/bands) band keys, so its self-join grows
    *     n^2 / keys no matter how clustered the data is (the r13 5x
    *     probe measured exactly this: 41x shuffle with the belt on,
    *     ~5x IVF-only).
    *  2. Belt fallback: if the sample shows IVF misses, the belt comes
    *     back on at the CHEAPEST full-recall config of the
    *     [[rhpTuning]] design table (threshold pairs on the same
    *     sample), or the dense registered default if none reaches full
    *     recall — the recall contract outranks the cost win.
    *
    * Both design collects are bounded (sample mutual pairs / one row
    * per config). Equality vs the brute oracle is hash-checked at
    * every SF like q_mutual_nn. */
  def mutualNnClusteredTuned(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      thresholdPpm: Long = 700000L,
      configs: Seq[(Int, Int)] = Seq((16, 8), (16, 4), (8, 4), (8, 2))): DataFrame =
    mutualNnTuned(corpus, idCol, vecCol, thresholdPpm, configs,
      fallbackCentroids = -1, fallbackNprobe = 1)

  /** The sample-sufficiency discipline GENERALIZED to any corpus density
    * (VERDICT r13 Next #3): the registered q_mutual_nn used to hardcode
    * its dense operating point (nprobe=2 + 16/8 multi-probe LSH, the r12
    * zero-mismatch sweep point); now the SAME bounded design sample that
    * prices the clustered twin decides PER CORPUS —
    *
    *  1. IVF-only sufficiency (the sparse regime): sample brute mutual
    *     pairs == sample IVF-only candidates' pairs => run the corpus
    *     IVF-only. A clustered corpus earns its linear candidate volume
    *     here; near-random embeddings (ANN's adversarial case) fail this
    *     check because a top-1 neighbor lands past the single probed
    *     bucket.
    *  2. Belt pricing: if the sample shows IVF misses AND carries
    *     >= thresholdPpm structure (n_true > 0), the [[rhpTuning]]
    *     design table picks the cheapest full-recall banding config.
    *     n_true == 0 no longer counts as full recall (r13 soundness
    *     hole, latent while only clustered corpora took this path): an
    *     empty truth set prices NOTHING — a dense corpus's sample has no
    *     0.7-cosine pairs, and "cheapest config against zero evidence"
    *     would have shipped a recall-losing plan. Empty truth falls
    *     through to 3.
    *  3. Dense fallback: the zero-mismatch operating point
    *     (`fallbackCentroids`/`fallbackNprobe` + 16/8 multi-probe; the
    *     registered q_mutual_nn passes its r12-swept 8/2) — the recall
    *     contract outranks the cost win, and the brute oracle replays
    *     UNCHANGED whichever branch runs.
    *
    * The decision prints one stderr line (`[graft] mutualNnTuned: ...`)
    * so any probe run can attribute which regime a corpus earned.
    * `fallbackCentroids = -1` derives [[clusterCount]] from the corpus
    * count. All design collects are bounded (~500-vector sample).
    *
    * The earned decision is CACHED in a ledger keyed by a corpus
    * fingerprint — row count + order-independent bit_xor of
    * xxhash64(id, vec), one aggregate pass that doubles as the count —
    * plus the parameter tuple (VERDICT r14 Next #3): repeat invocations
    * over the same corpus skip the design jobs entirely, any content or
    * parameter change misses and re-earns the regime at runtime. */
  def mutualNnTuned(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      thresholdPpm: Long = 700000L,
      configs: Seq[(Int, Int)] = Seq((16, 8), (16, 4), (8, 4), (8, 2)),
      fallbackCentroids: Int = -1,
      fallbackNprobe: Int = 1): DataFrame = {
    def phase[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      System.err.println(f"[graft] mutualNnTuned phase $label: " +
        f"${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }
    // ---- tuning-decision ledger (VERDICT r14 Next #3): the design
    // sample, centroids, sample-brute pairs and rhpTuning table used to
    // be recomputed on EVERY invocation — a stable ~6 s regression at
    // sf0.1 for a decision that is a pure function of (corpus content,
    // tuning parameters). The decision is cached keyed by a corpus
    // FINGERPRINT (row count + order-independent bit_xor of
    // xxhash64(id, vec) — one cheap aggregate that also replaces the
    // count() pass) plus the parameter tuple; any corpus or parameter
    // change misses and re-earns the regime. The ledger lives beside the
    // staging tree (wiped with the store root, so every full bench sweep
    // still earns pass 1 cold — re-draws and later sessions hit).
    val fp = phase("fingerprint")(
      corpus.select(xxhash64(col(idCol), col(vecCol)).as("h"))
        .agg(count(lit(1)).as("n"),
          coalesce(expr("bit_xor(h)"), lit(0L)).as("x")).head())
    val n = fp.getLong(0)
    val nC = clusterCount(n)
    val fbC = if (fallbackCentroids > 0) fallbackCentroids else nC
    val ledgerKey = {
      val params = s"$thresholdPpm|${configs.mkString(",")}|$fbC|$fallbackNprobe"
      f"${n}%d_${fp.getLong(1)}%016x_${java.util.UUID.nameUUIDFromBytes(
        params.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toString.take(8)}"
    }
    val ledgerDir = new java.io.File(
      s"${graft.store.SnapshotStore.root}/_mnn_tune")
    val ledgerFile = new java.io.File(ledgerDir, s"$ledgerKey.txt")
    def runDecision(decision: String): DataFrame = decision.split(":") match {
      case Array("ivf") =>
        mutualNnPairsAnn(corpus, idCol, vecCol,
          nCentroids = nC, nprobe = 1, bands = 0)
      case Array("belt", nb, bd) =>
        mutualNnPairsAnn(corpus, idCol, vecCol, nCentroids = nC, nprobe = 1,
          nbits = nb.toInt, bands = bd.toInt, multiProbe = false)
      case Array("pq", dims, sub, kc, it, mm) =>
        mutualNnPairsPq(corpus, idCol, vecCol, dims.toInt,
          subspaces = sub.toInt, kCodes = kc.toInt, iters = it.toInt,
          m = mm.toInt)
      case Array("dense") =>
        // r15: the fallback runs the EXPLICIT dense scan — the old
        // 16/8 multi-probe belt at this regime emitted 6.2x the cross
        // product as candidates (see mutualNnPairsDense scaladoc), so
        // the "ANN" point cost strictly more than dense in both axes
        // while its recall was only sweep-checked; the dense scan is
        // oracle-identical by construction.
        mutualNnPairsDense(corpus, idCol, vecCol)
      case other => throw new IllegalStateException(
        s"corrupt mutualNnTuned ledger entry: ${other.mkString(":")}")
    }
    val cachedDecision: Option[String] =
      if (!ledgerFile.isFile) None
      else Some(new String(java.nio.file.Files.readAllBytes(ledgerFile.toPath),
        java.nio.charset.StandardCharsets.UTF_8).trim)
    cachedDecision match {
      case Some(decision) =>
        System.err.println(
          s"[graft] mutualNnTuned: $decision (ledger hit $ledgerKey)")
        runDecision(decision)
      case None =>
        val sampleMod = math.max(4L, n / 500L)
        val sample = corpus.filter(pmod(col(idCol), lit(sampleMod)) === 1L)
        val cent = ivfCentroids(corpus, idCol, vecCol, nC)
        val sampleBrute = phase("sampleBrute")(
          mutualNnPairs(sample, idCol, vecCol)
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
        val sampleIvf = phase("sampleIvf")(
          mutualNnPairsAnn(sample, idCol, vecCol,
            nCentroids = nC, nprobe = 1, bands = 0, centroids = Some(cent))
            .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet)
        val decision =
          if (sampleIvf == sampleBrute && sampleBrute.nonEmpty) {
            System.err.println(s"[graft] mutualNnTuned: IVF-only " +
              s"(sample ${sampleBrute.size} mutual pairs, full parity)")
            "ivf"
          } else {
            val design = phase("design")(
              rhpTuning(sample, idCol, vecCol, configs, thresholdPpm)
                .collect()) // bounded: one row per config
            val full = design.filter { r =>
              r.getAs[Long]("n_true") > 0L &&
                !r.isNullAt(r.fieldIndex("recall_ppm")) &&
                r.getAs[Long]("recall_ppm") == 1000000L
            }
            if (full.nonEmpty) {
              val best = full.minBy(r => (r.getAs[Long]("n_candidates"),
                r.getAs[Long]("nbits"), r.getAs[Long]("bands")))
              val (nb, bd) =
                (best.getAs[Long]("nbits").toInt, best.getAs[Long]("bands").toInt)
              System.err.println(s"[graft] mutualNnTuned: belt ($nb, $bd) " +
                s"(cheapest full-recall of ${full.length}/${design.length} configs)")
              s"belt:$nb:$bd"
            } else {
              // PQ-ADC pricing before the dense registered default
              // (VERDICT r14 Next #4): codes come from the PRODUCTION
              // quantizer (trained on the corpus, cached per path), and
              // the sample must reach exact mutual-pair parity at HALF
              // the production candidate budget (m/2 = 8 of m = 16) —
              // the margin that buys headroom between a sample-priced
              // point and the corpus run. Parity => the corpus runs on
              // code-width candidates; any miss => the vector-width
              // dense belt keeps the recall contract.
              val pqDecision = phase("pqParity") {
                val dims = corpus.select(size(col(vecCol))).head.getInt(0)
                val (sub, kc, it) = (8, 16, 2)
                val budgets = Seq(8, 16, 32, 64) // half-budgets priced
                if (dims % sub != 0 || sampleBrute.isEmpty) None
                else {
                  val qqS = sample.select(col(idCol),
                    Clustering.quantizeMils(col(vecCol)).as("_qv"))
                  val sampleN = sample.select(col(idCol), col(vecCol))
                    .withColumn("_n", l2norm(col(vecCol)))
                  def missAt(ranked: DataFrame, mHalf: Int): (Int, Int) = {
                    val samplePq = mutualFromCandidates(
                      ranked.filter(col("rank") <= mHalf)
                        .select(col("src"), col("dst")),
                      sampleN, idCol, vecCol)
                      .collect()
                      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
                      .toSet
                    ((sampleBrute diff samplePq).size,
                      (samplePq diff sampleBrute).size)
                  }
                  // CHEAP pre-check against the OPTIMISTIC bound: a
                  // quantizer trained on the sample itself, encoding
                  // exactly the vectors it trained on — the most
                  // favorable codebook PQ can have for this probe. If
                  // even that misses > 5% of the sample's mutual pairs
                  // at the smallest budget, the production (corpus-
                  // trained) quantizer cannot do better and the
                  // refutation closes without ever training on the
                  // corpus (the expensive step this phase used to pay).
                  val (encPre, booksPre) = Clustering.pqEncode(
                    sample, idCol, vecCol, dims, sub, kc, it)
                  val preRanked = Clustering.pqAdcCandidates(
                    encPre, qqS, idCol, booksPre, dims, budgets.head)
                  val (preMiss, preSpur) = missAt(preRanked, budgets.head)
                  System.err.println(s"[graft] mutualNnTuned pq parity " +
                    s"PRE (in-sample books) m/2=${budgets.head}: " +
                    s"missed=$preMiss spurious=$preSpur of " +
                    s"${sampleBrute.size} sample mutual pairs")
                  if (preMiss > math.max(1, sampleBrute.size / 20)) None
                  else {
                    // the pre-check survived: price the PRODUCTION
                    // quantizer (corpus-trained) — ONE ADC scan at the
                    // largest half-budget; each smaller budget is its
                    // rank-prefix (pqAdcCandidates contract). Ascending
                    // sweep with an early exit: measured on the
                    // near-random fixture, quadrupling the budget only
                    // HALVES the missed pairs (93→75→57→33 of 121 at
                    // 8/16/32/64) — once a budget misses > 5% of pairs,
                    // zero misses is out of reach this side of brute.
                    val (encC, books) = Clustering.pqEncode(
                      corpus, idCol, vecCol, dims, sub, kc, it)
                    val encS = encC
                      .filter(pmod(col(idCol), lit(sampleMod)) === 1L)
                    val ranked = graft.store.Staging.stage(
                      Clustering.pqAdcCandidates(encS, qqS, idCol, books,
                        dims, budgets.max),
                      "mnn_pq_parity")
                    var verdict: Option[String] = None
                    var hopeless = false
                    budgets.iterator
                      .takeWhile(_ => verdict.isEmpty && !hopeless)
                      .foreach { mHalf =>
                        val (miss, spur) = missAt(ranked, mHalf)
                        System.err.println(s"[graft] mutualNnTuned pq " +
                          s"parity m/2=$mHalf: missed=$miss spurious=$spur " +
                          s"of ${sampleBrute.size} sample mutual pairs")
                        if (miss == 0 && spur == 0)
                          verdict = Some(s"pq:$dims:$sub:$kc:$it:${mHalf * 2}")
                        else if (miss > math.max(1, sampleBrute.size / 20))
                          hopeless = true
                      }
                    verdict
                  }
                }
              }
              pqDecision match {
                case Some(d) =>
                  System.err.println(s"[graft] mutualNnTuned: $d " +
                    s"(sample parity at half budget, " +
                    s"${sampleBrute.size} mutual pairs)")
                  d
                case None =>
                  System.err.println(s"[graft] mutualNnTuned: dense fallback " +
                    s"(sample demanded it: ivf parity=${sampleIvf == sampleBrute}, " +
                    s"truth pairs=${design.headOption.map(_.getAs[Long]("n_true")).getOrElse(-1L)}, " +
                    s"pq parity=false)")
                  "dense"
              }
            }
          }
        // atomic publish (tmp + move) so a killed run never leaves a
        // half-written entry
        ledgerDir.mkdirs()
        val tmp = new java.io.File(ledgerDir, s".$ledgerKey.tmp")
        java.nio.file.Files.write(tmp.toPath,
          (decision + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
        try java.nio.file.Files.move(tmp.toPath, ledgerFile.toPath,
          java.nio.file.StandardCopyOption.ATOMIC_MOVE,
          java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        catch {
          case _: java.nio.file.AtomicMoveNotSupportedException =>
            java.nio.file.Files.move(tmp.toPath, ledgerFile.toPath,
              java.nio.file.StandardCopyOption.REPLACE_EXISTING)
            ()
        }
        runDecision(decision)
    }
  }

  /** Frozen coarse quantizer: the deterministic seeded centroid frame
    * shared by [[ivfTopK]] and [[ivfIncrementalTopK]]. */
  private[graft] def ivfCentroids(corpus: DataFrame, idCol: String, vecCol: String,
      nCentroids: Int): DataFrame =
    corpus.filter(col(idCol) < nCentroids)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("_cvec"))
      .withColumn("_cn", l2norm(col("_cvec")))

  private def centSimPpm(vec: Column, n: Column): Column =
    floor(dot(vec, col("_cvec")) / (n * col("_cn")) * 1e6).cast("long")

  /** Per-id nearest-centroid assignment (smaller cid wins ties):
    * broadcast of C centroid rows, map-side-combined argmax — corpus
    * vectors never shuffle to get assigned. */
  private[graft] def ivfAssign(corpusN: DataFrame, cent: DataFrame,
      idCol: String, vecCol: String): DataFrame =
    corpusN.crossJoin(broadcast(cent))
      .withColumn("_csim", centSimPpm(col(vecCol), col("_n")))
      .groupBy(col(idCol), col(vecCol), col("_n"))
      .agg(max(struct(col("_csim").as("s"), (-col("cid")).as("nc"))).as("_m"))
      .select(col(idCol), col(vecCol), col("_n"), (-col("_m.nc")).as("cid"))

  /** Probe + verify tail shared by the batch and incremental IVF paths:
    * nprobe nearest centroid buckets per query, exact cosine within. */
  private[graft] def ivfSearch(assigned: DataFrame, cent: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, qIdCol: String, qVecCol: String,
      k: Int, nprobe: Int): DataFrame = {
    val queriesN = queries.withColumn("_qn", l2norm(col(qVecCol)))
    val wp = Window.partitionBy(col(qIdCol)).orderBy(col("_qsim").desc, col("cid"))
    val probes = queriesN.crossJoin(broadcast(cent))
      .withColumn("_qsim", centSimPpm(col(qVecCol), col("_qn")))
      .withColumn("_pr", row_number().over(wp))
      .filter(col("_pr") <= nprobe)
      .select(col(qIdCol), col("cid"))

    val w = Window.partitionBy(col(qIdCol)).orderBy(col("sim_ppm").desc, col(idCol))
    assigned
      .join(broadcast(probes), Seq("cid"))
      .filter(col(idCol) =!= col(qIdCol))
      .join(broadcast(queriesN.select(col(qIdCol), col(qVecCol), col("_qn"))), Seq(qIdCol))
      .withColumn("sim_ppm",
        floor(dot(col(vecCol), col(qVecCol)) / (col("_n") * col("_qn")) * 1e6).cast("long"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("sim_ppm"))
  }

  /** INCREMENTAL inverted-file maintenance + search — the index-append
    * path an embedding store runs on every ingest batch: the quantizer
    * is FROZEN (trained offline; here the seeded centroid frame over
    * the full table, shared with [[ivfTopK]]), the base corpus's
    * postings are a STAGED parquet index of compact (id, cid, norm)
    * rows — vectors are NOT in the postings; they join back only for
    * candidate-sized verify, the inverted-file layout that holds at
    * 100 TB — and a new batch assigns only ITS vectors (batch-sized
    * broadcast argmax) and unions onto the staged index, never
    * re-assigning the base. Assignment is per-row independent under a
    * frozen quantizer, so the merged index is bit-identical to a full
    * rebuild and the search result EQUALS [[ivfTopK]] over the whole
    * corpus — that equality is the correctness contract (the oracle
    * replays the full build; IncrementalSpec-style equality is asserted
    * in SimilaritySpec).
    *
    * `deltaPred` marks the new-batch rows inside `corpus` (the
    * q_dedup_incremental split convention). */
  def ivfIncrementalTopK(
      corpus: DataFrame,
      deltaPred: Column,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      nCentroids: Int = 8,
      nprobe: Int = 2): DataFrame = {
    val cent = ivfCentroids(corpus, idCol, vecCol, nCentroids)
    def norm(df: DataFrame) =
      df.select(col(idCol), col(vecCol)).withColumn("_n", l2norm(col(vecCol)))
    val basePostings = graft.store.Staging.stage(
      ivfAssign(norm(corpus.filter(!deltaPred)), cent, idCol, vecCol)
        .select(col(idCol), col("cid"), col("_n")),
      "ivf_postings_base")
    val deltaPostings = ivfAssign(norm(corpus.filter(deltaPred)), cent, idCol, vecCol)
      .select(col(idCol), col("cid"), col("_n"))
    // read-after-append view of the index; vectors join back by id for
    // the candidate-sized verify only
    val assigned = basePostings.unionByName(deltaPostings)
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
    ivfSearch(assigned, cent, queries, idCol, vecCol, qIdCol, qVecCol, k, nprobe)
  }

  /** [[ivfIncrementalTopK]] plus DOC DELETION — the full index-maintenance
    * loop a production embedding store runs: dedup kills documents, so
    * stale postings must drop without rewriting the staged index. Deletes
    * are TOMBSTONES (the MergeStore.writeCommit row-shadowing shape): the
    * kill list is an id frame anti-joined onto the postings read view —
    * the base postings parquet is never rewritten, and a compaction pass
    * can fold tombstones in later exactly like MergeStore's OPTIMIZE.
    *
    * The quantizer stays FROZEN through deletes — deleting a document
    * that seeded a centroid removes it from every RESULT (its postings
    * are shadowed) but keeps its centroid as a bucket anchor, which is
    * precisely how an offline-trained coarse quantizer behaves between
    * retrains. Under that frozen quantizer, per-row assignment
    * independence gives the contract: tombstoned-merged index ==
    * full rebuild over (corpus − deleted), verified in SimilaritySpec
    * and by q_ann_incremental_delete's oracle (the shared full-build
    * ivfSearch SQL with the delete predicate applied to the corpus CTE).
    *
    * Scale shape: the kill list is batch-sized (one dedup batch's
    * casualties), the anti-join is one shuffle of the compact (id, cid,
    * norm) postings — vectors still never move to get deleted. */
  def ivfIncrementalDeleteTopK(
      corpus: DataFrame,
      deletePred: Column,
      appendPred: Column,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      nCentroids: Int = 8,
      nprobe: Int = 2): DataFrame = {
    val (cent, live) =
      ivfLiveView(corpus, deletePred, appendPred, idCol, vecCol, nCentroids)
    val assigned = live.join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
    ivfSearch(assigned, cent, queries, idCol, vecCol, qIdCol, qVecCol, k, nprobe)
  }

  /** Shared live-view construction for the tombstoned index: frozen
    * quantizer centroids plus the (id, cid, norm) postings view =
    * (staged base over ¬append, plus delta assignment over append),
    * anti-joined against the delete tombstones. [[ivfIncrementalDeleteTopK]]
    * searches this view directly; [[ivfCompactTopK]] rewrites it as a
    * fresh staged index first — both MUST see the identical view, which
    * is why it is built in exactly one place. */
  private def ivfLiveView(
      corpus: DataFrame,
      deletePred: Column,
      appendPred: Column,
      idCol: String,
      vecCol: String,
      nCentroids: Int): (DataFrame, DataFrame) = {
    val cent = ivfCentroids(corpus, idCol, vecCol, nCentroids)
    def norm(df: DataFrame) =
      df.select(col(idCol), col(vecCol)).withColumn("_n", l2norm(col(vecCol)))
    val basePostings = graft.store.Staging.stage(
      ivfAssign(norm(corpus.filter(!appendPred)), cent, idCol, vecCol)
        .select(col(idCol), col("cid"), col("_n")),
      "ivf_postings_base")
    val deltaPostings = ivfAssign(norm(corpus.filter(appendPred)), cent, idCol, vecCol)
      .select(col(idCol), col("cid"), col("_n"))
    val tombstones = corpus.filter(deletePred).select(col(idCol))
    val live = basePostings.unionByName(deltaPostings)
      .join(tombstones, Seq(idCol), "left_anti")
    (cent, live)
  }

  /** COMPACTION of the tombstoned index — the OPTIMIZE step that closes
    * the ANN maintenance loop (append [[ivfIncrementalTopK]] → delete
    * [[ivfIncrementalDeleteTopK]] → compact): the live view (base ∪
    * appends, minus tombstones) is REWRITTEN as a fresh staged postings
    * index, after which reads stop paying the union + anti-join.
    *
    * The defining property — and the 100 TB cost argument — is that
    * compaction never touches a VECTOR and never re-assigns: it is a
    * pure rewrite of the compact (id, cid, norm) frame, exactly
    * MergeStore.optimize's parquet-rewrite cost, parallel by cid. The
    * contract: search over the compacted index == search over the
    * tombstoned live view == full rebuild over (corpus − deleted), all
    * three hash-checked against the one full-build oracle
    * (q_ann_compact shares q_ann_incremental_delete's SQL). */
  def ivfCompactTopK(
      corpus: DataFrame,
      deletePred: Column,
      appendPred: Column,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      nCentroids: Int = 8,
      nprobe: Int = 2): DataFrame = {
    val (cent, live) =
      ivfLiveView(corpus, deletePred, appendPred, idCol, vecCol, nCentroids)
    val compacted = graft.store.Staging.stage(live, "ivf_postings_compacted")
    val assigned = compacted.join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
    ivfSearch(assigned, cent, queries, idCol, vecCol, qIdCol, qVecCol, k, nprobe)
  }

  /** Embedding-cosine near-duplicate pairs — the vector-space member of
    * the dedup family (exact/minhash/simhash/jaccard cover text):
    * candidates are distinct id pairs sharing ≥1 random-hyperplane LSH
    * band (bucket self-join, skew-capped — never all-pairs), verified by
    * exact cosine ≥ `minSimPpm` within buckets. With the md5 hyperplane
    * family every stage (signature, band, candidate, cosine) reproduces
    * bit-identically in an external SQL engine, so the approximate
    * pipeline is oracle-checkable end-to-end.
    *
    * Scale shape: the signature frame is (id, long) — staged once through
    * the parquet store (it feeds the band join); candidate ids
    * shuffle first and vectors join back after, so full embeddings ride
    * only the candidate-sized joins. Output (id_a, id_b, sim_ppm),
    * id_a < id_b. */
  def embedNearDupPairs(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      minSimPpm: Long,
      nbits: Int = 16,
      bands: Int = 4,
      maxBucket: Int = 10000,
      signatures: (DataFrame, String, Column, Int) => DataFrame = rhpSignatures): DataFrame = {
    // staged through the parquet store (not localCheckpoint): the
    // signature frame is the persisted index of this pipeline, and both
    // its consumers read replicated files instead of executor-resident
    // blocks (VERDICT r4 What's-wrong #2)
    val sigs = graft.store.Staging.stage(
      signatures(corpus, idCol, col(vecCol), nbits), "embed_sig")
    val vecs = corpus.select(col(idCol), col(vecCol)).withColumn("_n", l2norm(col(vecCol)))
    Dedup.candidatePairs(sigs, idCol,
        Dedup.simhashBlockKeys(col("sig"), nbits, bands), maxBucket)
      .join(vecs.select(col(idCol).as("id_a"), col(vecCol).as("_va"), col("_n").as("_na")), Seq("id_a"))
      .join(vecs.select(col(idCol).as("id_b"), col(vecCol).as("_vb"), col("_n").as("_nb")), Seq("id_b"))
      .withColumn("sim_ppm",
        floor(dot(col("_va"), col("_vb")) / (col("_na") * col("_nb")) * 1e6).cast("long"))
      .filter(col("sim_ppm") >= minSimPpm)
      .select(col("id_a"), col("id_b"), col("sim_ppm"))
  }

  /** Cross-split embedding leakage (test→train contamination census):
    * test vectors probe the STAGED train-side signature index — the
    * eval-set hygiene check of a training pipeline, in EMBEDDING space
    * so paraphrase-level contamination is caught where the n-gram
    * decontaminate pass ([[graft.operators.Dedup]]) only sees verbatim
    * overlap. Same LSH-band machinery as [[embedNearDupPairs]] but
    * ACROSS frames: the train index is built and staged once, every
    * eval refresh probes it (the q_dedup_incremental contract — never a
    * test×train product), exact cosine verifies within buckets only.
    * Output: (test_id, train_id, sim_ppm), pairs clearing minSimPpm. */
  /** Shared quantizer for a clustered frame: [[ivfCentroids]] seeds over
    * [[clusterCount]] centroids derived from one bounded corpus count.
    * Public so leakage callers seed train AND test from the full-corpus
    * union (seeding from one split can orphan clusters — see
    * [[embedLeakagePairsIvf]]). */
  def clusterCentroids(corpus: DataFrame, idCol: String, vecCol: String): DataFrame =
    ivfCentroids(corpus, idCol, vecCol, clusterCount(corpus.count()))

  /** Train/test leakage pairs on IVF-POSTINGS candidates — the SPARSE
    * path for a clustered corpus (VERDICT r12 Next #3, refined by the
    * r13 25x expfit): the LSH-band variant below has a FIXED key space
    * (bands * 2^(nbits/bands) buckets), so its candidate join is
    * structurally quadratic in n — at the 25x probe point the (16, 4)
    * bands measured exp 3.83 in shuffle. Here candidates ride the
    * inverted file instead: train rows stage as (id, cid) postings under
    * the supplied quantizer, each test vector probes its own assigned
    * bucket, and candidate volume is sum-of-bucket-sizes squared —
    * linear in n at bounded cluster size, like [[mutualNnClusteredTuned]].
    *
    * `centroids` must be seeded from the train ∪ test UNION (pass
    * [[ivfCentroids]] of the full corpus): seeding from train alone can
    * orphan a cluster whose seed id fell in the test split, and
    * near-tie assignments of an orphaned cluster's members may then
    * split between buckets, costing recall. Recall contract: a leaked
    * pair is found iff test and train twin assign to the same centroid
    * — on a separated clustered corpus that is every >= threshold pair,
    * hash-checked against the replayed-assignment oracle at every SF. */
  def embedLeakagePairsIvf(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      vecCol: String,
      minSimPpm: Long,
      centroids: DataFrame): DataFrame = {
    val trainN = train.select(col(idCol), col(vecCol))
      .withColumn("_n", l2norm(col(vecCol)))
    val testN = test.select(col(idCol), col(vecCol))
      .withColumn("_n", l2norm(col(vecCol)))
    val postings = graft.store.Staging.stage(
      ivfAssign(trainN, centroids, idCol, vecCol).select(col(idCol), col("cid")),
      "leak_train_postings")
    val probes = ivfAssign(testN, centroids, idCol, vecCol)
      .select(col(idCol).as("test_id"), col("cid"))
    probes
      .join(postings.select(col(idCol).as("train_id"), col("cid")), Seq("cid"))
      .join(testN.select(col(idCol).as("test_id"), col(vecCol).as("_vt"),
        col("_n").as("_nt")), Seq("test_id"))
      .join(trainN.select(col(idCol).as("train_id"), col(vecCol).as("_vr"),
        col("_n").as("_nr")), Seq("train_id"))
      .withColumn("sim_ppm",
        floor(dot(col("_vt"), col("_vr")) / (col("_nt") * col("_nr")) * 1e6).cast("long"))
      .filter(col("sim_ppm") >= minSimPpm)
      .select(col("test_id"), col("train_id"), col("sim_ppm"))
  }

  def embedLeakagePairs(
      train: DataFrame,
      test: DataFrame,
      idCol: String,
      vecCol: String,
      minSimPpm: Long,
      nbits: Int = 16,
      bands: Int = 4,
      maxBucket: Int = 10000,
      signatures: (DataFrame, String, Column, Int) => DataFrame = rhpSignatures): DataFrame = {
    val trainSig = graft.store.Staging.stage(
      signatures(train, idCol, col(vecCol), nbits), "leak_train_sig")
    val testSig = signatures(test, idCol, col(vecCol), nbits)
    def keys = Dedup.simhashBlockKeys(col("sig"), nbits, bands)
    def side(df: DataFrame, as: String) = df
      .select(col(idCol).as(as), col(vecCol).as(s"_v$as"),
        l2norm(col(vecCol)).as(s"_n$as"))
    Dedup.candidatePairsAcross(trainSig, keys, testSig, keys, idCol, maxBucket)
      .withColumnRenamed("new_id", "test_id")
      .withColumnRenamed("old_id", "train_id")
      .join(side(test, "test_id"), Seq("test_id"))
      .join(side(train, "train_id"), Seq("train_id"))
      .withColumn("sim_ppm",
        floor(dot(col("_vtest_id"), col("_vtrain_id"))
          / (col("_ntest_id") * col("_ntrain_id")) * 1e6).cast("long"))
      .filter(col("sim_ppm") >= minSimPpm)
      .select(col("test_id"), col("train_id"), col("sim_ppm"))
  }

  /** LSH-bucketed approximate top-k: candidates = corpus rows sharing ≥1
    * signature band with the query, verified by exact cosine, ranked.
    * `signatures` picks the hash family (xxhash64 default; md5 for
    * external-oracle reproducibility). */
  /** Multi-probe band keys (Lv et al.): for each block, the exact key
    * PLUS every Hamming-1 perturbation of the block's value —
    * width + 1 keys per block. Applied to the QUERY side only (queries
    * are few; the corpus index stays one key per block), it recovers
    * candidates whose signature differs by one bit inside every block —
    * the dominant recall loss of plain banding — at probe-count cost
    * instead of index-size cost (more probes, not more hash tables). */
  def multiProbeBlockKeys(fp: Column, nbits: Int, blocks: Int): Column = {
    val width = nbits / blocks
    array((0 until blocks).flatMap { b =>
      val v = pmod(shiftright(fp, b * width), lit(1L << width))
      (v +: (0 until width).map(i => v.bitwiseXOR(lit(1L << i))))
        .map(x => concat_ws(":", lit(b).cast("string"), x.cast("string")))
    }: _*)
  }

  def annTopK(
      corpus: DataFrame,
      queries: DataFrame,
      idCol: String,
      vecCol: String,
      qIdCol: String,
      qVecCol: String,
      k: Int,
      nbits: Int = 16,
      bands: Int = 4,
      signatures: (DataFrame, String, Column, Int) => DataFrame = rhpSignatures,
      queryKeys: (Column, Int, Int) => Column = Dedup.simhashBlockKeys): DataFrame = {
    // same "<band>:<value>" key layout as the simhash block join
    def bandKeys(sig: Column): Column = Dedup.simhashBlockKeys(sig, nbits, bands)

    val corpusBandRows = signatures(corpus, idCol, col(vecCol), nbits)
      .select(col(idCol), explode(bandKeys(col("sig"))).as("_band"))
    val queryBandRows = signatures(queries, qIdCol, col(qVecCol), nbits)
      .select(col(qIdCol), explode(queryKeys(col("sig"), nbits, bands)).as("_band"))

    // candidate ids first (small shuffle payload), vectors joined back after
    val candIds = corpusBandRows
      .join(broadcast(queryBandRows), Seq("_band"))
      .filter(col(idCol) =!= col(qIdCol))
      .select(col(qIdCol), col(idCol))
      .distinct()
    val candidates = candIds
      .join(corpus.select(col(idCol), col(vecCol)), Seq(idCol))
      .join(broadcast(queries.select(col(qIdCol), col(qVecCol))), Seq(qIdCol))

    val w = Window.partitionBy(col(qIdCol)).orderBy(col("sim_ppm").desc, col(idCol))
    candidates
      .withColumn("sim_ppm", cosinePpm(col(vecCol), col(qVecCol)))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qIdCol), col("rank"), col(idCol), col("sim_ppm"))
  }

  /** k-NN LABEL CLASSIFICATION over the embedding corpus: each eval
    * vector takes the majority label of its k nearest TRAIN neighbors
    * by exact cosine (ties: higher vote count, then smaller label — the
    * deterministic mode). The weak-labeling / label-propagation /
    * auto-eval primitive of an embedding pipeline (classify new docs by
    * proximity to labeled ones; audit embedding quality by held-out
    * accuracy). Composes [[topKExact]]'s two-phase ranking, so the
    * neighbor search inherits its contract (broadcast eval set, shard-
    * local partial top-k); at corpus scale swap in [[annTopK]]/IVF
    * candidates — the vote/tie logic is identical downstream of any
    * neighbor frame.
    *
    * Output: (q_id, true_label, predicted, n_votes, correct). */
  def knnClassify(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      evalFilter: Column,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val train = emb.filter(!evalFilter)
    val eval_ = emb.filter(evalFilter)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        col(labelCol).cast("long").as("true_label"))
    val nn = topKExact(train, eval_.select(col("q_id"), col("q_vec")),
      idCol, vecCol, "q_id", "q_vec", k)
    voteMajority(nn, train, eval_, idCol, labelCol)
  }

  /** Majority vote + deterministic tie-break shared by the brute and
    * ANN-candidate classifiers — identical downstream of ANY neighbor
    * frame (q_id, <idCol>). */
  private def voteMajority(nn: DataFrame, train: DataFrame, eval_ : DataFrame,
      idCol: String, labelCol: String): DataFrame = {
    val votes = nn
      .join(train.select(col(idCol), col(labelCol).cast("long").as("_nl")), Seq(idCol))
      .groupBy(col("q_id"), col("_nl")).agg(count(lit(1)).as("_v"))
    val pick = votes.groupBy(col("q_id"))
      .agg(max(struct(col("_v").as("v"), (-col("_nl")).as("nl"))).as("_m"))
      .select(col("q_id"), (-col("_m.nl")).as("predicted"), col("_m.v").as("n_votes"))
    eval_.select(col("q_id"), col("true_label"))
      .join(pick, Seq("q_id"))
      .withColumn("correct",
        (col("true_label") === col("predicted")).cast("long"))
  }

  /** [[knnClassify]] on ANN CANDIDATES — the plan you'd run at 100 TB:
    * the brute |eval|·|train| scorer is the ORACLE, not the production
    * path. Neighbors come from the union of two verified candidate
    * generators with complementary failure modes — [[ivfTopK]] (coarse
    * buckets; misses a neighbor only when it hides past `nprobe`
    * centroid buckets) and [[annTopK]] (random-hyperplane LSH bands;
    * misses only when all `bands` band keys differ) — re-ranked by
    * exact cosine and cut to k.
    *
    * RECALL CONTRACT: the result equals the brute classifier exactly
    * iff the union candidate set contains each eval point's true top-k;
    * on the benchmark corpus that equality is hash-checked against the
    * brute SQL oracle at every SF (q_knn_classify), and on a new corpus
    * the same number is measurable as recall@k via the q_ann_recall_*
    * twins before trusting the swap. Scale shape: no |eval|·|train|
    * stage anywhere — IVF candidates ride bucket joins, LSH candidates
    * ride band-bucket joins, and the re-rank touches only candidate
    * rows.
    *
    * DEFAULT OPERATING POINT, measured (BUILDER_NOTES round 10): the
    * benchmark embeddings are near-random — the adversarial case for
    * ANN, where recall buys candidates expensively (a 7-point
    * (nCentroids, nprobe, nbits, bands) sweep at 3 SFs left 1-90
    * label mismatches at every sparser point). Exact parity on this
    * corpus needs nprobe=6/8 buckets + 2-bit LSH bands — a DENSE
    * candidate set. On a clustered production corpus the same plan
    * runs sparse (fewer probes, wider bands) at the recall the
    * q_ann_recall_* twins measure; the plan SHAPE (bucket joins only)
    * is what survives 100 TB, and the density knob is per-corpus. */
  def knnClassifyAnn(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      evalFilter: Column,
      k: Int,
      nCentroids: Int = 8,
      nprobe: Int = 6,
      nbits: Int = 16,
      bands: Int = 8): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val train = emb.filter(!evalFilter)
    val eval_ = emb.filter(evalFilter)
      .select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
        col(labelCol).cast("long").as("true_label"))
    val evalQ = eval_.select(col("q_id"), col("q_vec"))
    val ivfNn = ivfTopK(train, evalQ, idCol, vecCol, "q_id", "q_vec", k,
      nCentroids, nprobe)
    val lshNn = annTopK(train, evalQ, idCol, vecCol, "q_id", "q_vec", k,
      nbits, bands)
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim_ppm").desc, col(idCol))
    // dedup on (q_id, id) via max, not distinct-on-3: both generators
    // compute the same floor(cos·10⁶) but the contract must not hinge on
    // bit-equal doubles across two plans
    val nn = ivfNn.unionByName(lshNn)
      .groupBy(col("q_id"), col(idCol)).agg(max(col("sim_ppm")).as("sim_ppm"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col(idCol))
    voteMajority(nn, train, eval_, idCol, labelCol)
  }

  /** Hard-example triplet mining for contrastive training (the batch
    * construction step of embedding-model fine-tuning: each anchor needs
    * its hardest negative — the most-similar vector with a DIFFERENT
    * label, the one the model currently confuses — and its hardest
    * positive — the least-similar vector sharing its label). Emits both
    * plus the triplet margin (pos_sim − neg_sim); a negative margin is a
    * currently-violated triplet, the training signal.
    *
    * Scale shape: the anchor set broadcasts (it is the small side by
    * construction — a minibatch or a sampled audit set), so scoring is
    * anchors·N row-local dot products with NO corpus shuffle; both
    * extrema then ride ONE map-side-combinable aggregate (conditional
    * max/min of (sim, id) structs), so the only exchange carries
    * |anchors| partial rows per task. At corpus scale swap the scorer
    * for [[annTopK]]/IVF candidates exactly as [[knnClassify]] does.
    *
    * Determinism: cosine in integer ppm (the [[cosinePpm]] currency);
    * ties break to the smaller id on both sides. Output: (a_id, a_label,
    * neg_id, neg_sim_ppm, pos_id, pos_sim_ppm, margin_ppm). */
  def hardNegatives(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      anchorFilter: Column): DataFrame = {
    val corpus = emb.select(col(idCol).as("_id"), col(vecCol).as("_v"),
        col(labelCol).cast("long").as("_l"))
      .withColumn("_n", l2norm(col("_v")))
    val anchors = emb.filter(anchorFilter)
      .select(col(idCol).as("a_id"), col(vecCol).as("_av"),
        col(labelCol).cast("long").as("a_label"))
      .withColumn("_an", l2norm(col("_av")))
    val scored = corpus.crossJoin(broadcast(anchors))
      .filter(col("_id") =!= col("a_id"))
      .withColumn("sim_ppm",
        floor(dot(col("_v"), col("_av")) / (col("_n") * col("_an")) * 1e6).cast("long"))
    scored.groupBy(col("a_id"), col("a_label"))
      .agg(
        max(when(col("_l") =!= col("a_label"),
          struct(col("sim_ppm").as("s"), (-col("_id")).as("ni")))).as("_neg"),
        min(when(col("_l") === col("a_label"),
          struct(col("sim_ppm").as("s"), col("_id").as("i")))).as("_pos"))
      .select(col("a_id"), col("a_label"),
        (-col("_neg.ni")).as("neg_id"), col("_neg.s").as("neg_sim_ppm"),
        col("_pos.i").as("pos_id"), col("_pos.s").as("pos_sim_ppm"),
        (col("_pos.s") - col("_neg.s")).as("margin_ppm"))
  }

  /** [[hardNegatives]]' hardest-NEGATIVE half on ANN CANDIDATES — the
    * corpus-scale variant of the triplet miner (the broadcast-exact
    * scorer above stays the oracle): each anchor's most-similar
    * DIFFERENT-label vector found among bucket-join candidates only —
    * the anchors probe the staged IVF postings index (`nprobe` nearest
    * centroid buckets) plus the corpus LSH band index (with Hamming-1
    * multi-probe on the anchor side, [[multiProbeBlockKeys]] — anchors
    * are few, so extra probe keys are cheap where extra index keys are
    * not), exact cosine verifies within candidates, and ONE map-side
    * argmax picks the hardest negative (ties → smaller id, the
    * [[hardNegatives]] currency).
    *
    * Only the negative half swaps: the hardest POSITIVE is a
    * FARTHEST-point search (least-similar same-label vector), which
    * similarity-bucket candidates structurally cannot serve — a
    * production pipeline mines positives from metadata (same source
    * doc, augmentation pair) rather than embedding distance, so the ANN
    * variant emits (a_id, a_label, neg_id, neg_sim_ppm).
    *
    * RECALL CONTRACT, same as [[mutualNnPairsAnn]]: exact equality with
    * the brute argmax is hash-checked against the brute SQL oracle at
    * every SF; the default operating point is the cheapest
    * graft.HnProbe sweep point with zero mismatches at 3 SFs —
    * (nCentroids 8, nprobe 2, 32-bit/8-band LSH): notably SPARSER than
    * mutualNnPairsAnn's (4-bit blocks, N/16 buckets), because the
    * anchor-side Hamming-1 multi-probe is built in and a hardest
    * negative only needs ONE direction found. */
  def hardNegativesAnn(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      anchorFilter: Column,
      nCentroids: Int = 8,
      nprobe: Int = 2,
      nbits: Int = 32,
      bands: Int = 8): DataFrame = {
    val corpus = emb.select(col(idCol).as("_id"), col(vecCol).as("_v"),
        col(labelCol).cast("long").as("_l"))
      .withColumn("_n", l2norm(col("_v")))
    val anchors = emb.filter(anchorFilter)
      .select(col(idCol).as("a_id"), col(vecCol).as("_av"),
        col(labelCol).cast("long").as("a_label"))
      .withColumn("_an", l2norm(col("_av")))
    // IVF side: anchors probe the staged compact postings index
    val cent = ivfCentroids(emb, idCol, vecCol, nCentroids)
    val corpusN = emb.select(col(idCol), col(vecCol))
      .withColumn("_n", l2norm(col(vecCol)))
    val postings = graft.store.Staging.stage(
      ivfAssign(corpusN, cent, idCol, vecCol).select(col(idCol), col("cid")),
      "hn_postings")
    val wp = Window.partitionBy(col("a_id")).orderBy(col("_qsim").desc, col("cid"))
    val probes = anchors.crossJoin(broadcast(cent))
      .withColumn("_qsim", centSimPpm(col("_av"), col("_an")))
      .withColumn("_pr", row_number().over(wp))
      .filter(col("_pr") <= nprobe)
      .select(col("a_id"), col("cid"))
    val ivfCand = postings.join(broadcast(probes), Seq("cid"))
      .select(col("a_id"), col(idCol).as("_id"))
    // LSH side: staged corpus band index probed by multi-probe anchor keys
    val sigs = graft.store.Staging.stage(
      rhpSignatures(emb, idCol, col(vecCol), nbits), "hn_sigs")
    val corpusBands = sigs.select(col(idCol).as("_id"),
      explode(Dedup.simhashBlockKeys(col("sig"), nbits, bands)).as("_band"))
    val anchorBands = rhpSignatures(emb.filter(anchorFilter), idCol, col(vecCol), nbits)
      .select(col(idCol).as("a_id"),
        explode(multiProbeBlockKeys(col("sig"), nbits, bands)).as("_band"))
    val lshCand = corpusBands.join(broadcast(anchorBands), Seq("_band"))
      .select(col("a_id"), col("_id"))
    val cands = ivfCand.unionByName(lshCand).distinct()
      .filter(col("_id") =!= col("a_id"))
    // exact verify within candidates; different-label argmax only
    cands
      .join(corpus, Seq("_id"))
      .join(broadcast(anchors), Seq("a_id"))
      .filter(col("_l") =!= col("a_label"))
      .withColumn("sim_ppm",
        floor(dot(col("_v"), col("_av")) / (col("_n") * col("_an")) * 1e6).cast("long"))
      .groupBy(col("a_id"), col("a_label"))
      .agg(max(struct(col("sim_ppm").as("s"), (-col("_id")).as("ni"))).as("_neg"))
      .select(col("a_id"), col("a_label"),
        (-col("_neg.ni")).as("neg_id"), col("_neg.s").as("neg_sim_ppm"))
  }

  /** Per-DIMENSION robust statistics of an embedding column — the
    * feature-QC pass before any distance-based pipeline (a dimension
    * with a shifted median or a fat outlier tail poisons every cosine
    * downstream): exact nearest-rank quartiles of each dimension's
    * value distribution (micro-unit quantized — floor(v·10⁶), identical
    * IEEE double ops in any engine) plus an outlier census under the
    * robust rule |v − median| > max(3·IQR, 1) (≈ 4σ under normality,
    * immune to the outliers it hunts, unlike mean/stddev).
    *
    * Scale shape: posexplode fans each vector to `dims` rows (a fixed
    * ×64-class factor, not data-dependent); quartiles ride
    * [[Stats.nearestRankPercentiles]]'s per-dim window (dims are the
    * partition key — at most `dims` groups, perfectly spread); the
    * dim-keyed stats frame (dims rows) broadcasts back for the census.
    * Output: (dim, n, p25_us, p50_us, p75_us, iqr_us, n_outliers). */
  def dimRobustStats(emb: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val el = emb
      .select(col(idCol).as("_id"), posexplode(col(vecCol)).as(Seq("dim", "_v")))
      .select(col("_id"), col("dim").cast("long").as("dim"),
        floor(col("_v").cast("double") * 1000000).cast("long").as("v_us"))
    val stats = Stats.nearestRankPercentiles(el, "dim", "v_us", "_id", Seq(25, 50, 75))
      .select(col("dim"), col("n_docs").as("_n"),
        col("p25_v_us"), col("p50_v_us"), col("p75_v_us"),
        (col("p75_v_us") - col("p25_v_us")).as("_iqr"))
    el.join(broadcast(stats), Seq("dim"))
      .groupBy(col("dim"))
      .agg(max(col("_n")).as("n"),
        max(col("p25_v_us")).as("p25_us"),
        max(col("p50_v_us")).as("p50_us"),
        max(col("p75_v_us")).as("p75_us"),
        max(col("_iqr")).as("iqr_us"),
        sum(when(abs(col("v_us") - col("p50_v_us")) >
            greatest(col("_iqr") * 3L, lit(1L)), 1L).otherwise(0L))
          .as("n_outliers"))
  }

  /** Split-half centroid consistency per label — the embedding-space
    * DRIFT monitor: partition each label's vectors into two halves by a
    * deterministic id residue (shard A = even, shard B = odd — in
    * production, yesterday's batch vs today's) and report the cosine
    * between the two half-centroids. A homogeneous stable class scores
    * near 10⁶; a class whose embedding distribution shifted between
    * shards (upstream encoder change, topic drift, label noise) drops —
    * the per-class early-warning before [[embedLeakagePairs]]-style
    * downstream damage.
    *
    * ENGINE-EXACT: dims are quantized to integers (floor(v·1024)); the
    * centroid cosine cancels the 1/n factors — cos(Σa/n_a, Σb/n_b) =
    * cos(Σa, Σb) — so the statistic runs on integer SUM vectors, and the
    * output is the sign-split SIGNED SQUARED cosine in ppm (the
    * [[graft.operators.TimeSeries.crossCorrPpm]] discipline: no sqrt →
    * no libm; monotone in |cos| with cos's sign). DECIMAL(38,0) carries
    * (Σ s_a·s_b)²·10⁶ — exact to ~10⁸ unit-norm vectors per half at 64
    * dims; pre-average per shard past that.
    *
    * Scale shape: one posexplode (fixed ×dims fan) → ONE map-side-
    * combined (label, half, dim) sum aggregation (groups = labels ×
    * 2 × dims, domain-bounded); the pairing join and cosine run on that
    * tiny frame. Nothing vector-sized shuffles. Output: one row per
    * label with both halves present: (label, n_a, n_b, cos2s_ppm). */
  def splitHalfCentroidDrift(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      scale: Int = 1024): DataFrame = {
    require(scale >= 1, s"scale must be >= 1: $scale")
    val sums = emb
      .select(col(labelCol).as("label"), (col(idCol) % 2 === 0).as("_ha"),
        posexplode(col(vecCol)).as(Seq("dim", "_v")))
      .select(col("label"), col("_ha"), col("dim"),
        floor(col("_v").cast("double") * scale).cast("long").as("_q"))
      .groupBy(col("label"), col("_ha"), col("dim"))
      // each vector contributes exactly one row per dim, so count = n
      .agg(sum(col("_q")).as("_s"), count(lit(1)).as("_n"))
    val a = sums.filter(col("_ha"))
      .select(col("label"), col("dim"), col("_s").as("_sa"), col("_n").as("_na"))
    val b = sums.filter(!col("_ha"))
      .select(col("label"), col("dim"), col("_s").as("_sb"), col("_n").as("_nb"))
    a.join(b, Seq("label", "dim"))
      .groupBy(col("label"))
      .agg(max(col("_na")).as("n_a"), max(col("_nb")).as("n_b"),
        sum(expr("CAST(_sa AS DECIMAL(38,0)) * _sb")).as("_num"),
        sum(expr("CAST(_sa AS DECIMAL(38,0)) * _sa")).as("_da"),
        sum(expr("CAST(_sb AS DECIMAL(38,0)) * _sb")).as("_db"))
      .withColumn("cos2s_ppm",
        when(col("_da") > 0 && col("_db") > 0,
          signum(col("_num")).cast("long") *
            expr("CAST(_num * _num * 1000000 DIV (_da * _db) AS BIGINT)"))
          .otherwise(0L))
      .select(col("label").cast("long").as("label"), col("n_a"), col("n_b"),
        col("cos2s_ppm"))
  }

  /** Label-noise audit (confident-learning-lite): each vector's
    * signed-squared cosine to its OWN class centroid, lowest-similarity
    * vectors first — the mislabel candidates a labeling pipeline
    * re-queues for review. Same integer discipline as
    * [[splitHalfCentroidDrift]]: cos(v, Σ/n) = cos(v, Σ), so the
    * statistic runs on quantized per-dim integers against the class SUM
    * vector — no float mean, no sqrt. The vector IS included in its own
    * class sum (leave-one-out would subtract it; at class sizes ≳ 100
    * the difference is noise and the included form needs no second
    * pass — documented contract).
    *
    * Scale shape: one (label, dim) map-side sum aggregation (domain-
    * bounded groups) broadcast back onto the posexploded vectors; the
    * per-vector dot products map-side-combine to one row per vector;
    * TakeOrdered top-k. Nothing quadratic, nothing label-pair-sized.
    *
    * Output: (vec_id, label, n_label, cos2s_ppm) — the k lowest, ties
    * by vec_id. */
  def labelOutliers(
      emb: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      topK: Int,
      scale: Int = 1024): DataFrame = {
    require(topK >= 1, s"topK must be >= 1: $topK")
    val el = emb.select(col(idCol).as("_id"), col(labelCol).as("label"),
        posexplode(col(vecCol)).as(Seq("dim", "_v")))
      .select(col("_id"), col("label"), col("dim"),
        floor(col("_v").cast("double") * scale).cast("long").as("_q"))
    val sums = el.groupBy(col("label"), col("dim"))
      .agg(sum(col("_q")).as("_s"), count(lit(1)).as("_n"))
    el.join(broadcast(sums), Seq("label", "dim"))
      .groupBy(col("_id"), col("label"))
      .agg(max(col("_n")).as("n_label"),
        sum(expr("CAST(_q AS DECIMAL(38,0)) * _s")).as("_num"),
        sum(expr("CAST(_q AS DECIMAL(38,0)) * _q")).as("_dq"),
        sum(expr("CAST(_s AS DECIMAL(38,0)) * _s")).as("_ds"))
      .withColumn("cos2s_ppm",
        when(col("_dq") > 0 && col("_ds") > 0,
          signum(col("_num")).cast("long") *
            expr("CAST(_num * _num * 1000000 DIV (_dq * _ds) AS BIGINT)"))
          .otherwise(0L))
      .select(col("_id").as("vec_id"), col("label").cast("long").as("label"),
        col("n_label"), col("cos2s_ppm"))
      .orderBy(col("cos2s_ppm"), col("vec_id"))
      .limit(topK)
  }

  /** Maximal-marginal-relevance rerank (Carbonell & Goldstein 1998) —
    * the diversity pass between retrieval and consumption: from each
    * query's candidate list, greedily pick the item maximizing
    * λ·rel − (1−λ)·max-sim-to-already-picked. λ = 1/2 cleared of the
    * division: score2 = rel_ppm − max_psim_ppm, pure integers, ties to
    * the smaller candidate id — fully deterministic, so the oracle
    * replays the identical greedy trail step by step.
    *
    * Input: `cands` (qId, candId, rel_ppm) — the per-query candidate
    * lists (top-N from any retriever; N is the scale knob, the corpus
    * never enters); `pairs` (qId, a_id, b_id, psim_ppm) — pairwise sims
    * among each query's candidates (N² per query, domain-bounded),
    * a_id/b_id holding candId values for every ordered pair a ≠ b.
    *
    * Scale shape: retrieval upstream is the data-sized work; here every
    * frame is (queries × N) or (queries × N²) rows, each greedy round is
    * one join + one (qId, candId) max agg + one rank-1 window — ALL
    * keyed on qId, so a million queries spread across the cluster and
    * the k rounds never funnel. Output: (qId, rank, candId, score2_ppm),
    * rank 1..k in pick order; rank 1's score2 = its rel (empty picked
    * set contributes max-sim 0). */
  def mmrRerank(
      cands: DataFrame,
      pairs: DataFrame,
      qId: String,
      candId: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val wPick = Window.partitionBy(col(qId))
      .orderBy(col("_score").desc, col(candId))
    def pick1(scored: DataFrame, r: Int): DataFrame = scored
      .withColumn("_rn", row_number().over(wPick))
      .filter(col("_rn") === 1)
      .select(col(qId), lit(r.toLong).as("rank"), col(candId),
        col("_score").as("score2_ppm"))
    var selected = pick1(cands.withColumn("_score", col("rel_ppm")), 1)
    (2 to k).foreach { r =>
      val selIds = selected.select(col(qId), col(candId).as("b_id"))
      val maxsim = pairs.join(selIds, Seq(qId, "b_id"))
        .groupBy(col(qId), col("a_id"))
        .agg(max(col("psim_ppm")).as("_maxsim"))
        .withColumnRenamed("a_id", candId)
      val scored = cands
        .join(selected.select(col(qId), col(candId)), Seq(qId, candId), "left_anti")
        .join(maxsim, Seq(qId, candId))
        .withColumn("_score", col("rel_ppm") - col("_maxsim"))
      // stage each round (the CC/pagerank iterative-frame pattern):
      // round r references selected(r-1) THREE times (probe ids,
      // anti-join, union), so an unstaged chain re-embeds round 1's
      // subplan 3^(r-1) times — measured 8.0 s for k=5 on frames of a
      // few dozen rows, pure plan-blowup; staged rounds read a flat
      // file scan instead (0.9 s, and content-keyed reuse across runs)
      selected = graft.store.Staging.stage(
        selected.unionByName(pick1(scored, r)), s"mmr_sel$r")
    }
    selected
  }

  /** Per-class precision/recall/F1 census from a (true, predicted)
    * frame — the eval rollup every classifier run ([[knnClassify]],
    * label-model audits) needs: per class c, tp = |true=c ∧ pred=c|,
    * n_true and n_pred the marginals, and the three ratios exact in
    * ppm (F1 = 2·tp/(n_pred+n_true) — the harmonic mean cleared to ONE
    * division). Classes appearing only as truth or only as prediction
    * still get a row (full-outer marginals, zero-filled). Three
    * map-side-combinable aggregations over the prediction frame.
    * Output: (class, n_true, n_pred, tp, precision_ppm, recall_ppm,
    * f1_ppm). */
  def classMetrics(pred: DataFrame, trueCol: Column, predCol: Column): DataFrame = {
    val p = pred.select(trueCol.cast("long").as("_t"), predCol.cast("long").as("_p"))
    val byTrue = p.groupBy(col("_t").as("class")).agg(count(lit(1)).as("n_true"))
    val byPred = p.groupBy(col("_p").as("class")).agg(count(lit(1)).as("n_pred"))
    val tp = p.filter(col("_t") === col("_p"))
      .groupBy(col("_t").as("class")).agg(count(lit(1)).as("tp"))
    byTrue.join(byPred, Seq("class"), "full")
      .join(tp, Seq("class"), "left")
      .na.fill(0L, Seq("n_true", "n_pred", "tp"))
      .withColumn("precision_ppm",
        when(col("n_pred") > 0, expr("tp * 1000000 DIV n_pred")))
      .withColumn("recall_ppm",
        when(col("n_true") > 0, expr("tp * 1000000 DIV n_true")))
      .withColumn("f1_ppm",
        when(col("n_pred") + col("n_true") > 0,
          expr("2 * tp * 1000000 DIV (n_pred + n_true)")))
  }
}
