package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic distributed Lloyd k-means over an embedding column, plus
  * the SemDeDup-style within-cluster semantic dedup built on it.
  *
  * The TRAINED coarse quantizer the IVF path deliberately skips
  * (`Similarity.ivfTopK` uses a data-independent id-based quantizer):
  * this is the real thing, shaped for Spark's execution model —
  *
  *  - **Assignment is row-local.** Centroids are k·D integers held on the
  *    driver and inlined as literals, so each Lloyd pass maps every
  *    vector with a codegen'd `least(struct(dist_j, j), ...)` projection:
  *    no join, no shuffle, no per-row candidate explosion. On a
  *    1000-executor cluster the centroid table rides the closure exactly
  *    like a broadcast variable (k=256, D=1024 is still 2 MB).
  *  - **The update is one map-side-combined aggregation.** posexplode to
  *    (cluster, dim, x) then sum/count: partial aggregation reduces the
  *    shuffle to ~partitions·k·D rows regardless of input size, and the
  *    k·D aggregated sums collected to the driver are statistics, not
  *    data (same contract as Approx's top-N probe keys).
  *  - **Everything is exact int64.** Vectors are quantized to mils
  *    (floor(x·1000)) up front; distances are Σ(a−b)² over ints and the
  *    centroid update is a floor-mean, so a DuckDB oracle replays the
  *    identical iteration trail bit-for-bit — no FP convergence drift
  *    between engines, which is what makes a CHECKABLE k-means possible.
  *
  * Determinism contract (mirrored verbatim in the oracle SQL):
  *  - init: centroids 0..k−1 = the quantized vectors of the k lowest ids;
  *  - assignment ties broken toward the lowest centroid index;
  *  - centroid update = per-dimension floor(sum/count);
  *  - a cluster left empty keeps its previous centroid.
  *
  * The quantized frame is staged once (content-keyed parquet) — each
  * Lloyd pass re-reads a compact (id, D longs) file scan instead of
  * re-deriving the projection, and that staged frame IS the quantized
  * vector store a production IVF build persists.
  */
object Clustering {

  /** floor(x·1000) per dimension as int64 — the exact-arithmetic currency
    * every distance/centroid computation downstream uses. */
  def quantizeMils(vec: Column): Column =
    transform(vec, x => floor(x.cast("double") * 1000).cast("long"))

  /** Squared L2 distance to each driver-held centroid as a codegen'd
    * projection; returns struct(d, c) of the nearest (ties → lowest c). */
  private def nearest(cents: Array[Array[Long]], v: Column): Column = {
    val packed = cents.zipWithIndex.map { case (c, j) =>
      struct(
        aggregate(
          zip_with(v, typedLit(c.toSeq), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("d"),
        lit(j.toLong).as("c"))
    }
    // array_min, not least(): least's type unification re-labels struct
    // fields (col1/col2), losing the d/c names callers read
    if (packed.length == 1) packed.head else array_min(array(packed.toSeq: _*))
  }

  /** `iters` full Lloyd iterations (assign + update), then a final
    * assignment against the trained centroids. Output: (idCol, cluster,
    * dist) — dist is the exact int64 squared distance in mils². */
  def kmeans(points: DataFrame, idCol: String, vecCol: String, k: Int, iters: Int)
      : DataFrame = {
    val q = graft.store.Staging.stage(
      points.select(col(idCol), quantizeMils(col(vecCol)).as("_qv")),
      s"kmeans_q$k")
    kmeansQuantized(q, idCol, k, iters)
  }

  /** Lloyd over an ALREADY-quantized frame (idCol, `_qv` int64 array) —
    * the entry point for sub-space callers (product quantization slices
    * one staged quantized frame eight ways; re-staging each cheap slice
    * projection would buy nothing). */
  def kmeansQuantized(q: DataFrame, idCol: String, k: Int, iters: Int): DataFrame =
    assignQuantized(q, idCol, trainCentroids(q, idCol, k, iters))

  /** Row-local nearest-centroid assignment of a quantized frame against
    * trained centroids: (idCol, cluster, dist). The centroids are baked
    * into the projection as literals — the fastest shape while k·D stays
    * plan-sized (one codegen'd pass, zero joins); past a few thousand
    * centroids the k-struct expression outgrows codegen/analysis budgets
    * (measured in BUILDER_NOTES) — use [[assignQuantizedBroadcast]]. */
  def assignQuantized(q: DataFrame, idCol: String, cents: Array[Array[Long]]): DataFrame =
    q.select(col(idCol), nearest(cents, col("_qv")).as("_a"))
      .select(col(idCol), col("_a").getField("c").as("cluster"),
        col("_a").getField("d").as("dist"))

  /** Nearest-centroid assignment via a BROADCAST k-row centroid frame —
    * the large-k twin of [[assignQuantized]] for IVF builds with tens of
    * thousands of centroids, where a literal plan would not compile: the
    * plan stays O(1) in k (one broadcast nested-loop fan-out of n·k
    * candidate rows, then min per id). The min is a map-side-combined
    * struct-min (lexicographic (d, c) ⇒ smallest distance, ties to the
    * lowest centroid index — the exact [[assignQuantized]] tie rule), so
    * only ~n rows shuffle, never the n·k fan-out. */
  def assignQuantizedBroadcast(q: DataFrame, idCol: String, cents: Array[Array[Long]])
      : DataFrame = {
    // mirror the literal path's failure modes (ADVICE r7): nearest()
    // refuses an empty centroid set at plan build, and a ragged centroid
    // matrix must fail loudly — zip_with pads the short side with nulls,
    // so a malformed centroid's _d would go null and min(struct) could
    // silently award it the assignment
    require(cents.nonEmpty, "assignQuantizedBroadcast: empty centroid set")
    require(cents.forall(_.length == cents.head.length),
      s"assignQuantizedBroadcast: ragged centroid dims ${cents.map(_.length).distinct.mkString(",")}")
    val spark = q.sparkSession
    import spark.implicits._
    val cdf = cents.zipWithIndex.map { case (c, j) => (j.toLong, c.toSeq) }.toSeq
      .toDF("_c", "_cv")
    q.join(broadcast(cdf))
      .select(col(idCol), col("_c"),
        aggregate(zip_with(col("_qv"), col("_cv"), (a, b) => (a - b) * (a - b)),
          lit(0L), (acc, x) => acc + x).as("_d"))
      .groupBy(col(idCol))
      .agg(min(struct(col("_d").as("d"), col("_c").as("c"))).as("_a"))
      .select(col(idCol), col("_a").getField("c").as("cluster"),
        col("_a").getField("d").as("dist"))
  }

  /** The Lloyd training loop alone — returns the trained k×D centroid
    * matrix (driver-held; broadcast-class at any cluster size). Exposed
    * so product quantization can keep the per-subspace codebooks it
    * needs for asymmetric-distance search. */
  def trainCentroids(q: DataFrame, idCol: String, k: Int, iters: Int): Array[Array[Long]] = {
    require(k >= 1 && iters >= 0, s"need k >= 1 ($k), iters >= 0 ($iters)")

    var cents: Array[Array[Long]] = q.orderBy(col(idCol)).limit(k)
      .select(col("_qv")).collect()
      .map(_.getSeq[Long](0).toArray)

    for (_ <- 0 until iters) {
      // one job per iteration: row-local assignment feeding a
      // map-side-combined (cluster, dim) aggregation; k·D rows collected
      // the projection boundary before the field extraction matters:
      // getField directly on the composite resolves against CreateStruct
      // before its name placeholders fill (col1/col2), so the struct is
      // aliased in one select and its fields read in the next
      val sums = q
        .select(col("_qv"), nearest(cents, col("_qv")).as("_a"))
        .select(col("_a").getField("c").as("_c"),
          posexplode(col("_qv")).as(Seq("_d", "_x")))
        .groupBy(col("_c"), col("_d"))
        .agg(sum(col("_x")).as("_s"), count(lit(1)).as("_n"))
        .collect()
        .map(r => (r.getLong(0).toInt, r.getInt(1), r.getLong(2), r.getLong(3)))
      val byCluster = sums.groupBy(_._1)
      cents = cents.zipWithIndex.map { case (prev, j) =>
        byCluster.get(j) match {
          case Some(ds) => // floor-mean per dimension; exact ints
            val byDim = ds.map(d => d._2 -> ((d._3, d._4))).toMap
            prev.indices.map { d =>
              val (s, n) = byDim(d)
              Math.floorDiv(s, n)
            }.toArray
          case None => prev // empty cluster keeps its centroid
        }
      }
    }
    cents
  }

  /** Product quantization (Jégou et al. 2011): split each D-dim vector
    * into `subspaces` contiguous sub-vectors, train an independent
    * k-centroid codebook per subspace (the Lloyd loop above), and encode
    * every vector as `subspaces` nibble/byte codes packed into ONE long —
    * the compression that makes a 100 TB embedding store searchable in
    * memory (64 float32 dims → 8×4-bit codes is a 64× reduction here;
    * production uses k=256 bytes, same machinery).
    *
    * Returns (encoded frame: idCol, code, recon_err; codebooks). The
    * reconstruction error is EXACT int64: Σ over subspaces of the
    * squared mils distance to the chosen centroid — the same quantity a
    * recall model budgets against. Scale shape: the quantized frame is
    * staged once; each subspace trains on a row-local slice projection
    * of that one scan, and the final encode is a single projection
    * computing all subspace assignments at once (no per-subspace joins —
    * codebooks are driver-held literals). */
  /** Trained codebooks are memoized per (staged-input path, shape): the
    * stage path is content-keyed (hash of the canonicalized input plan),
    * so it is a sound cache key, and the three PQ registry queries
    * (encode, search, recall) plus bench pass 2 train ONCE per corpus —
    * the "train once, every job reads the codebook" production contract,
    * same driver-held-statistics class as the centroids themselves. */
  private val bookCache =
    scala.collection.concurrent.TrieMap.empty[(String, Int, Int, Int, Int), Array[Array[Array[Long]]]]

  /** One Lloyd loop training ALL subspace codebooks together: per
    * iteration a single projection computes every subspace's nearest
    * centroid and a single map-side-combined (subspace, cluster, dim)
    * aggregation feeds the driver update — iters+2 jobs total regardless
    * of subspace count (training them separately costs
    * subspaces×(iters+2) scheduler round-trips, measured 3× slower at
    * sf0.1). */
  def trainPqCodebooks(
      q: DataFrame,
      idCol: String,
      subspaces: Int,
      d: Int,
      k: Int,
      iters: Int): Array[Array[Array[Long]]] = {
    val seeds = q.orderBy(col(idCol)).limit(k).select(col("_qv")).collect()
      .map(_.getSeq[Long](0).toArray)
    var books: Array[Array[Array[Long]]] =
      (0 until subspaces).map(s => seeds.map(_.slice(s * d, (s + 1) * d))).toArray

    for (_ <- 0 until iters) {
      val asg = (0 until subspaces).map { s =>
        nearest(books(s), slice(col("_qv"), s * d + 1, d)).as(s"_a$s")
      }
      val codes = array((0 until subspaces).map(s => col(s"_a$s").getField("c")): _*)
      val sums = q
        .select(col("_qv") +: asg: _*)
        .select(codes.as("_cs"), posexplode(col("_qv")).as(Seq("_gd", "_x")))
        .select((col("_gd") / d).cast("int").as("_s"),
          element_at(col("_cs"), (col("_gd") / d).cast("int") + 1).as("_c"),
          (col("_gd") % d).as("_d"), col("_x"))
        .groupBy(col("_s"), col("_c"), col("_d"))
        .agg(sum(col("_x")).as("_sum"), count(lit(1)).as("_n"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1).toInt, r.getInt(2), r.getLong(3), r.getLong(4)))
      val bySub = sums.groupBy(_._1)
      books = books.zipWithIndex.map { case (book, s) =>
        val clusters = bySub.getOrElse(s, Array.empty).groupBy(_._2)
        book.zipWithIndex.map { case (prev, j) =>
          clusters.get(j) match {
            case Some(ds) =>
              val byDim = ds.map(x => x._3 -> ((x._4, x._5))).toMap
              prev.indices.map { dd =>
                val (su, n) = byDim(dd)
                Math.floorDiv(su, n)
              }.toArray
            case None => prev
          }
        }
      }
    }
    books
  }

  def pqEncode(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      dims: Int,
      subspaces: Int,
      k: Int,
      iters: Int): (DataFrame, Array[Array[Array[Long]]]) = {
    require(dims % subspaces == 0, s"dims ($dims) must split evenly into $subspaces subspaces")
    require(k <= 16 || subspaces * 8 <= 64, "packed code must fit one long")
    val d = dims / subspaces
    val q = graft.store.Staging.stage(
      points.select(col(idCol), quantizeMils(col(vecCol)).as("_qv")),
      "pq_q")
    val qPath = q.inputFiles.headOption
      .map(f => f.substring(0, f.lastIndexOf('/'))).getOrElse("")
    val books =
      if (qPath.nonEmpty)
        bookCache.getOrElseUpdate((qPath, dims, subspaces, k, iters),
          trainPqCodebooks(q, idCol, subspaces, d, k, iters))
      else trainPqCodebooks(q, idCol, subspaces, d, k, iters)
    val bits = if (k <= 16) 4 else 8
    // one projection computes every subspace's nearest centroid: the
    // assignments fold into (code, err) without any join
    val parts = (0 until subspaces).map { s =>
      nearest(books(s), slice(col("_qv"), s * d + 1, d)).as(s"_a$s")
    }
    val withAsg = q.select(col(idCol) +: parts: _*)
    val code = (0 until subspaces)
      .map(s => shiftleft(col(s"_a$s").getField("c"), bits * s))
      .reduce(_ + _)
    val err = (0 until subspaces).map(s => col(s"_a$s").getField("d")).reduce(_ + _)
    (withAsg.select(col(idCol), code.as("code"), err.as("recon_err")), books)
  }

  /** Asymmetric-distance (ADC) top-k over PQ codes: the query keeps its
    * exact quantized vector, the corpus is represented ONLY by codes —
    * distance = Σ_s ‖q_s − codebook_s[code_s]‖², computed row-locally by
    * decoding each nibble against the driver-held codebook literals.
    * This is the search shape where 100 TB of vectors fits RAM: scans
    * touch 8 bytes per vector, never the floats. */
  def pqTopK(
      encoded: DataFrame,
      queries: DataFrame, // (qIdCol, _qv full quantized vector)
      qIdCol: String,
      idCol: String,
      books: Array[Array[Array[Long]]],
      dims: Int,
      topK: Int): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("adc_dist"), col(idCol))
    encoded.select(col(idCol), col("code"))
      .crossJoin(broadcast(queries.select(col(qIdCol), col("_qv"))))
      .select(col(qIdCol), col(idCol), adcDist(books, dims).as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(qIdCol), col("rank"), col(idCol), col("adc_dist"))
  }

  /** ADC distance of the row's packed `code` to the row's quantized
    * query vector `_qv`: Σ_s ‖q_s − codebook_s[code_s]‖², decoded
    * row-locally against the driver-held codebook literals. */
  private def adcDist(books: Array[Array[Array[Long]]], dims: Int): Column = {
    val subspaces = books.length
    val d = dims / subspaces
    val bits = if (books.head.length <= 16) 4 else 8
    (0 until subspaces).map { s =>
      val bookLit = typedLit(books(s).map(_.toSeq).toSeq)
      val centroid = element_at(bookLit,
        (shiftright(col("code"), bits * s) % (1 << bits) + 1).cast("int"))
      aggregate(
        zip_with(slice(col("_qv"), s * d + 1, d), centroid, (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x)
    }.reduce(_ + _)
  }

  /** PQ-ADC candidate stream for all-corpus mutual-NN (VERDICT r14 Next
    * #4): every vector — as a query, by its quantized `_qv` — scans the
    * BROADCAST 8-byte code frame row-locally and keeps only its ADC
    * top-`m`. The broadcast nested-loop join is narrow (no exchange of
    * the scored stream), and the per-src top-m runs through a BOUNDED
    * typed aggregator whose map-side combine reduces each partition to
    * ≤ m rows per src before any shuffle — so the candidate stage ships
    * ~n·m slim (src, dst) pairs where the dense LSH belt shuffles a
    * vector-width stream. Compute is n²/p codegen'd ADC sums per task:
    * the dense regime's physics, deliberately paid in CPU against codes
    * instead of shuffle against vectors (the [[pqTopK]] "codes fit RAM"
    * premise; at 100 TB the code frame is the only corpus-sized
    * broadcast, 8 B/vector). Ordering ties break toward the smaller
    * dst, matching the exact-verify tie rule downstream. Output:
    * (src, dst), self-matches excluded. */
  def pqAdcCandidates(
      enc: DataFrame, // (idCol, code) from pqEncode
      qq: DataFrame, // (idCol, _qv) quantized queries
      idCol: String,
      books: Array[Array[Array[Long]]],
      dims: Int,
      m: Int): DataFrame = {
    val spark = enc.sparkSession
    import spark.implicits._
    val scored = qq.select(col(idCol).as("src"), col("_qv"))
      .crossJoin(broadcast(enc.select(col(idCol).as("_dst"), col("code"))))
      .filter(col("src") =!= col("_dst"))
      .select(col("src"), adcDist(books, dims).as("_dist"), col("_dst"))
      .as[(Long, Long, Long)]
    // rank = ADC position (1-based, ascending distance, ties → smaller
    // dst): a top-m' for any m' <= m is the rank <= m' prefix, which is
    // what lets mutualNnTuned price several budgets off ONE scan
    scored.groupByKey(_._1)
      .agg(new TopMByDist(m).toColumn)
      .flatMap { case (src, tops) =>
        tops.iterator.zipWithIndex.map { case (t, i) => (src, t._2, i + 1) }
      }
      .toDF("src", "dst", "rank")
  }

  /** IVF-PQ (Jégou et al. 2011 §V — the FAISS `IVFx,PQy` architecture):
    * a coarse inverted file restricts the search to `nprobe` probed
    * buckets, and within them ranking runs on 8-byte PQ codes via ADC —
    * so a 100 TB corpus contributes codes only, and only the probed
    * FRACTION of them is scanned (vs [[pqTopK]]'s full-corpus ADC scan).
    * The coarse quantizer is the cosine seeded-centroid IVF of
    * q_ann_ivf (ids < nCentroids — data-independent, so the oracle can
    * replay it); assignment is a map-side argmax over the broadcast
    * centroids; probes and queries both ride tiny broadcasts. Output:
    * (qIdCol, rank, idCol, adc_dist), self-matches excluded. */
  def ivfPqTopK(
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      queries: DataFrame, // (qIdCol, raw float vector qVecCol)
      qIdCol: String,
      qVecCol: String,
      dims: Int,
      subspaces: Int,
      kCodes: Int,
      iters: Int,
      nCentroids: Int,
      nprobe: Int,
      topK: Int): DataFrame = {
    import graft.operators.Similarity.{dot, l2norm}
    val cent = corpus.filter(col(idCol) < nCentroids)
      .select(col(idCol).cast("long").as("cid"), col(vecCol).as("_cvec"))
      .withColumn("_cn", l2norm(col("_cvec")))
    def simPpm(vec: Column, n: Column): Column =
      floor(dot(vec, col("_cvec")) / (n * col("_cn")) * 1e6).cast("long")
    val assigned = corpus.select(col(idCol), col(vecCol))
      .withColumn("_n", l2norm(col(vecCol)))
      .crossJoin(broadcast(cent))
      .withColumn("_csim", simPpm(col(vecCol), col("_n")))
      .groupBy(col(idCol))
      .agg(max(struct(col("_csim").as("s"), (-col("cid")).as("nc"))).as("_m"))
      .select(col(idCol), (-col("_m.nc")).as("cid"))
    val (enc, books) = pqEncode(corpus, idCol, vecCol, dims, subspaces, kCodes, iters)
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("_qsim").desc, col("cid"))
    val probes = queries.withColumn("_qn", l2norm(col(qVecCol)))
      .crossJoin(broadcast(cent))
      .withColumn("_qsim", simPpm(col(qVecCol), col("_qn")))
      .withColumn("_pr", row_number().over(wp))
      .filter(col("_pr") <= nprobe)
      .select(col(qIdCol), col("cid"))
    val qq = queries.select(col(qIdCol), quantizeMils(col(qVecCol)).as("_qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(qIdCol)).orderBy(col("adc_dist"), col(idCol))
    enc.join(assigned, Seq(idCol))
      .join(broadcast(probes), Seq("cid"))
      .filter(col(idCol) =!= col(qIdCol))
      .join(broadcast(qq), Seq(qIdCol))
      .select(col(qIdCol), col(idCol), adcDist(books, dims).as("adc_dist"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col(qIdCol), col("rank"), col(idCol), col("adc_dist"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): k-means-cluster the
    * embedding space, then drop every vector that has a LOWER-id neighbor
    * in its own cluster with cosine ≥ `minSimPpm`. Pairing is confined to
    * clusters — at 100 TB the pair count is Σ|cluster|², tuned by k, not
    * n² — and the similarity runs on the original float vectors with the
    * sequential-fold dot product both engines compute bit-identically.
    * Output: (idCol, cluster, kept 0/1) — the keep-mask shape of
    * q_dedup_keep, so downstream filters compose the same way. */
  def semDedup(points: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, minSimPpm: Long): DataFrame = {
    // label carries (k, iters): the assignment plan's centroid literals
    // can truncate in the canonicalized-plan key text, and (k, iters) is
    // what distinguishes two trainings over the same staged input
    val asg = graft.store.Staging.stage(
      kmeans(points, idCol, vecCol, k, iters), s"semdedup_asg${k}i$iters")
    val withVec = asg.join(points.select(col(idCol), col(vecCol)), Seq(idCol))
    val a = withVec.select(col(idCol).as("_ida"), col("cluster"), col(vecCol).as("_va"))
    val b = withVec.select(col(idCol).as("_idb"), col("cluster"), col(vecCol).as("_vb"))
    val pruned = a.join(b, Seq("cluster"))
      .filter(col("_idb") < col("_ida"))
      .filter(Similarity.cosinePpm(col("_va"), col("_vb")) >= minSimPpm)
      .select(col("_ida").as(idCol)).distinct()
    asg.join(pruned.withColumn("_p", lit(0)), Seq(idCol), "left_outer")
      .select(col(idCol), col("cluster"), coalesce(col("_p"), lit(1)).as("kept"))
  }

  /** Prototype-based example pruning (Sorscher et al. 2022, "Beyond
    * neural scaling laws: beating power law scaling via data pruning"):
    * in the abundant-data regime the best examples to DROP are the most
    * PROTOTYPICAL — those closest to their k-means centroid; the hard
    * (far) members carry the information the next epoch needs. The dual
    * of [[semDedup]] (which drops near-DUPLICATE members): this prunes
    * by position within the cluster, not by pairwise similarity, so it
    * never forms pairs at all.
    *
    * Deterministic threshold contract: per cluster, the exact
    * nearest-rank `prunePct`-th percentile of the int64 squared
    * distance ([[Stats.groupedExactQuantiles]] — the grouped 2-pass
    * selection, never a per-cluster rank window that would funnel each
    * cluster through one task) is the cut; members strictly below it
    * are pruned (kept = 0), ties at the cut survive. The pruned
    * fraction approaches prunePct/100 as distance ties thin out.
    *
    * Scale shape: assignment is row-local against driver-held
    * centroids; the quantile pass collects a (k × bins) histogram and
    * rescans only boundary bins; thresholds rejoin as a k-row
    * broadcast. Nothing ever shuffles on the cluster key. */
  def prototypePrune(points: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int, prunePct: Int,
      binWidth: Long = 1000000L): DataFrame = {
    require(prunePct >= 1 && prunePct <= 100, s"bad prunePct $prunePct")
    val asg = graft.store.Staging.stage(
      kmeans(points, idCol, vecCol, k, iters), s"protoprune_asg${k}i$iters")
    val thr = Stats.groupedExactQuantiles(
        asg, col("cluster").cast("string"), "dist", Seq(prunePct), binWidth)
      .select(col("g").cast("long").as("cluster"), col("dist").as("_thr"))
    asg.join(broadcast(thr), Seq("cluster"))
      .select(col(idCol), col("cluster"), col("dist"),
        (col("dist") >= col("_thr")).cast("long").as("kept"))
  }

  /** Diversity-maximizing subset selection: Gonzalez k-center greedy —
    * the data-curation primitive for a maximally-spread coreset (seed
    * examples, eval probes, annotation batches) with the classic 2-approx
    * guarantee for the k-center objective. Start from the smallest id;
    * each round adds the point FARTHEST from the chosen set (cosine
    * distance ⇒ smallest max-similarity; ties → smaller id).
    *
    * Scale shape: the corpus-sized state is ONE column (best similarity
    * to any chosen center so far). A round is (a) one map-side-combinable
    * argmin — `min(struct(best_sim, id))`, a single 1-row collect per
    * round, the bounded k-centroids collect class — and (b) one row-local
    * update `best_sim = greatest(best_sim, sim(p, new_center))` against
    * the 1-row broadcast center. k rounds scan k times; nothing is ever
    * pairwise and no center list is re-scored (each center's similarity
    * folds into the running max the round it is chosen).
    *
    * Output: (round, center_id, sel_sim_ppm) — sel_sim_ppm is the chosen
    * point's max-similarity to the prior centers at selection (-1 for the
    * seed round; monotonically NON-DECREASING by the greedy invariant,
    * asserted in ClusteringSpec). */
  def kCenterGreedy(
      points: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1: $k")
    val spark = points.sparkSession
    import spark.implicits._
    val base = points.select(col(idCol).as("_id"), col(vecCol).as("_v"))
      .withColumn("_n", Similarity.l2norm(col("_v")))
      .persist()
    val c0 = base.orderBy(col("_id")).limit(1)
      .select(col("_id"), col("_v"), col("_n")).collect()(0)
    val chosen = scala.collection.mutable.ArrayBuffer((0L, c0.getLong(0), -1L))
    def simTo(cVec: Seq[Float], cN: Double) =
      floor(Similarity.dot(col("_v"), lit(cVec.toArray)) / (col("_n") * lit(cN)) * 1e6)
        .cast("long")
    var state = base.withColumn("_bs",
      simTo(c0.getSeq[Float](1), c0.getDouble(2)))
    (1 until k).foreach { r =>
      val sel = state.agg(min(struct(col("_bs"), col("_id"))).as("_m"))
        .select(col("_m._bs"), col("_m._id")).collect()(0) // 1-row round pick
      val (selSim, selId) = (sel.getLong(0), sel.getLong(1))
      chosen += ((r.toLong, selId, selSim))
      val cRow = base.filter(col("_id") === selId)
        .select(col("_v"), col("_n")).collect()(0)
      state = state.withColumn("_bs",
        greatest(col("_bs"), simTo(cRow.getSeq[Float](0), cRow.getDouble(1))))
    }
    base.unpersist()
    chosen.toSeq.toDF("round", "center_id", "sel_sim_ppm")
  }
}

/** Bounded top-m typed aggregator over (src, dist, dst) rows: keeps the
  * m smallest (dist, dst) pairs in ascending tuple order (ties toward
  * the smaller dst, matching the exact-verify tie rule). The buffer
  * never exceeds m entries, so PARTIAL (map-side) aggregation bounds
  * the per-group shuffle at m rows — the whole point vs a window rank,
  * which exchanges the full scored stream before it can rank anything. */
private[operators] class TopMByDist(m: Int)
    extends org.apache.spark.sql.expressions.Aggregator[
      (Long, Long, Long), Seq[(Long, Long)], Seq[(Long, Long)]] {
  require(m > 0, s"top-m needs m > 0: $m")
  // invariant: buffers are ascending-sorted and at most m long
  override def zero: Seq[(Long, Long)] = Nil
  override def reduce(
      b: Seq[(Long, Long)], a: (Long, Long, Long)): Seq[(Long, Long)] = {
    val cand = (a._2, a._3)
    if (b.lengthCompare(m) >= 0 && Ordering[(Long, Long)].lteq(b.last, cand)) b
    else (cand +: b).sorted.take(m)
  }
  override def merge(
      x: Seq[(Long, Long)], y: Seq[(Long, Long)]): Seq[(Long, Long)] =
    (x ++ y).sorted.take(m)
  override def finish(r: Seq[(Long, Long)]): Seq[(Long, Long)] = r
  override def bufferEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
  override def outputEncoder: org.apache.spark.sql.Encoder[Seq[(Long, Long)]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[(Long, Long)]]()
}
