package graft

import org.apache.spark.sql.functions._

import graft.operators.Clustering

class ClusteringSpec extends SparkSpec {
  import spark.implicits._

  // two well-separated blobs in 4-d; ids interleaved across blobs so the
  // k-lowest-id seed starts with one centroid in each
  private def blobs = Seq(
    (1L, Seq(0.10f, 0.10f, 0.00f, 0.00f)),
    (2L, Seq(0.90f, 0.90f, 1.00f, 1.00f)),
    (3L, Seq(0.12f, 0.09f, 0.01f, 0.02f)),
    (4L, Seq(0.88f, 0.91f, 0.99f, 0.98f)),
    (5L, Seq(0.11f, 0.11f, 0.02f, 0.01f)),
    (6L, Seq(0.92f, 0.89f, 1.01f, 0.99f))
  ).toDF("vec_id", "embedding")

  test("kmeans separates planted blobs; dist is the exact int64 mils² distance") {
    val r = Clustering.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 3)
      .as[(Long, Long, Long)].collect().sortBy(_._1)
    val byCluster = r.groupBy(_._2).map { case (c, xs) => c -> xs.map(_._1).toSet }
    assert(byCluster(0L) == Set(1L, 3L, 5L), s"cluster 0: $byCluster")
    assert(byCluster(1L) == Set(2L, 4L, 6L), s"cluster 1: $byCluster")
    // exact distance replay for point 1 against the converged centroid of
    // {1,3,5}: quantized mils are floor(x·1000 as double); centroid =
    // per-dim floor-mean (replayed from the same float values, not
    // hand-rounded — 0.11f·1000 is 109.9999…, not 110)
    val q = Seq(
      Seq(0.10f, 0.10f, 0.00f, 0.00f),
      Seq(0.12f, 0.09f, 0.01f, 0.02f),
      Seq(0.11f, 0.11f, 0.02f, 0.01f)
    ).map(_.map(x => math.floor(x.toDouble * 1000).toLong))
    val cent = (0 until 4).map(d => Math.floorDiv(q.map(_(d)).sum, 3L))
    val expected = q.head.zip(cent).map { case (a, b) => (a - b) * (a - b) }.sum
    assert(r.find(_._1 == 1L).get._3 == expected)
  }

  test("kmeans is deterministic across invocations") {
    val a = Clustering.kmeans(blobs, "vec_id", "embedding", 2, 3).collect().toSeq
    val b = Clustering.kmeans(blobs, "vec_id", "embedding", 2, 3).collect().toSeq
    assert(a.sortBy(_.getLong(0)) == b.sortBy(_.getLong(0)))
  }

  test("iters=0 assigns against the raw k-lowest-id seed") {
    val r = Clustering.kmeans(blobs, "vec_id", "embedding", k = 2, iters = 0)
      .as[(Long, Long, Long)].collect()
    // seeds are vectors of ids 1 and 2; id 1 must sit at distance 0
    assert(r.find(_._1 == 1L).get._3 == 0L)
    assert(r.find(_._2 == 1L).get._1 % 2 == 0L, "blob-2 points go to seed 2")
  }

  test("empty cluster keeps its previous centroid (k > distinct points)") {
    val tiny = Seq(
      (1L, Seq(0.0f, 0.0f)),
      (2L, Seq(0.001f, 0.0f)),
      (3L, Seq(0.002f, 0.0f))).toDF("vec_id", "embedding")
    // k=3 over 3 near-identical points: after quantization points 1,2
    // collide at (0,0)-ish and centroid 2 can starve — must not throw,
    // and every point still gets its nearest (lowest-index tie) centroid
    val r = Clustering.kmeans(tiny, "vec_id", "embedding", k = 3, iters = 2)
      .as[(Long, Long, Long)].collect()
    assert(r.length == 3)
    assert(r.forall(_._3 >= 0))
  }

  test("assignment ties break toward the lowest centroid index") {
    // both seed vectors quantize identically ⇒ every point is equidistant
    // to centroid 0 and 1 ⇒ all assignments must be 0
    val dup = Seq(
      (1L, Seq(0.5f, 0.5f)),
      (2L, Seq(0.5f, 0.5f)),
      (3L, Seq(0.5004f, 0.5f))).toDF("vec_id", "embedding")
    val r = Clustering.kmeans(dup, "vec_id", "embedding", k = 2, iters = 1)
      .as[(Long, Long, Long)].collect()
    assert(r.forall(_._2 == 0L), r.mkString(","))
  }

  test("assignQuantizedBroadcast ≡ assignQuantized, incl. the tie rule") {
    val q = blobs.select(col("vec_id"), Clustering.quantizeMils(col("embedding")).as("_qv"))
    // duplicate centroid (index 0 and 2 identical) exercises the
    // ties-to-lowest-index rule through the broadcast-join min path
    val cents = Array(Array(100L, 100L, 0L, 0L), Array(900L, 900L, 1000L, 1000L),
      Array(100L, 100L, 0L, 0L))
    val lit = Clustering.assignQuantized(q, "vec_id", cents)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    val bc = Clustering.assignQuantizedBroadcast(q, "vec_id", cents)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(bc == lit, s"bc=$bc lit=$lit")
    assert(bc.forall(_._2 != 2L)) // the duplicate never wins a tie
  }

  test("pqEncode: k >= n makes every point its own centroid (zero recon error)") {
    val vecs = Seq(
      (1L, (1 to 8).map(_ * 0.01f)),
      (2L, (1 to 8).map(_ * -0.02f)),
      (3L, (1 to 8).map(i => (i % 3) * 0.1f)),
      (4L, (1 to 8).map(i => 0.3f - i * 0.05f))).toDF("vec_id", "embedding")
    val (enc, books) = graft.operators.Clustering.pqEncode(
      vecs, "vec_id", "embedding", dims = 8, subspaces = 2, k = 16, iters = 1)
    val rows = enc.as[(Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.forall(_._3 == 0L), s"recon_err must be 0 when k >= n: ${rows.toSeq}")
    // the k-lowest-id seed is bounded by n: 4 points -> 4 centroids
    assert(books.length == 2 && books.forall(_.length == 4))
    // identical vectors share a code
    val dup = vecs.union(Seq((9L, (1 to 8).map(_ * 0.01f))).toDF("vec_id", "embedding"))
    val codes = graft.operators.Clustering.pqEncode(
      dup, "vec_id", "embedding", 8, 2, 16, 1)._1
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    assert(codes(1L) == codes(9L), "byte-identical vectors must share the PQ code")
  }

  test("pqTopK: every query ranks itself first at dist == its recon error") {
    val vecs = (1L to 20L).map(i =>
      (i, (1 to 8).map(j => ((i * 7 + j * 3) % 11) * 0.05f))).toDF("vec_id", "embedding")
    val (enc, books) = graft.operators.Clustering.pqEncode(
      vecs, "vec_id", "embedding", dims = 8, subspaces = 2, k = 4, iters = 2)
    val queries = vecs.filter($"vec_id" <= 3L)
      .select($"vec_id".as("q_id"),
        graft.operators.Clustering.quantizeMils($"embedding").as("_qv"))
    val top = graft.operators.Clustering.pqTopK(
        enc, queries, "q_id", "vec_id", books, dims = 8, topK = 3)
      .as[(Long, Int, Long, Long)].collect()
    val errs = enc.as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    (1L to 3L).foreach { q =>
      val first = top.filter(t => t._1 == q && t._2 == 1).head
      // rank-1 may tie with an identically-coded vector, but the DIST must
      // equal the query's own reconstruction error
      assert(first._4 == errs(q), s"query $q rank-1 dist ${first._4} != recon ${errs(q)}")
    }
  }

  test("kCenterGreedy: axis geometry hand-check, greedy invariant, brute differential") {
    // seed = id 1 (x-axis). Farthest from {e_x}: the opposite vector 4
    // (sim -1e6). Then the orthogonal ones (sim 0 to both) by id order.
    val axes = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f)),
      (2L, Seq(0.0f, 1.0f, 0.0f)),
      (3L, Seq(0.0f, 0.0f, 1.0f)),
      (4L, Seq(-1.0f, 0.0f, 0.0f)),
      (5L, Seq(0.9f, 0.1f, 0.0f))) // near the seed — never an early pick
    val got = Clustering.kCenterGreedy(axes.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k = 4)
      .as[(Long, Long, Long)].collect().toSeq
    assert(got.map(_._2) == Seq(1L, 4L, 2L, 3L), got.toString)
    assert(got.map(_._3) == Seq(-1L, -1000000L, 0L, 0L), got.toString)
    // brute-force differential on random vectors + the greedy invariant
    val vecs = (1L to 40L).map { i =>
      (i, (0 until 4).map(d => (((i * 7919L + d * 104729L) % 2001L) - 1000L).toFloat / 100f))
    }
    val k = 6
    val g2 = Clustering.kCenterGreedy(vecs.toDF("vec_id", "embedding"),
        "vec_id", "embedding", k)
      .as[(Long, Long, Long)].collect().toSeq
    def simPpm(a: Seq[Float], b: Seq[Float]): Long = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 1e6).toLong
    }
    val byId = vecs.toMap
    var chosen = Seq(1L)
    var best = vecs.map(v => v._1 -> simPpm(v._2, byId(1L))).toMap
    val want = scala.collection.mutable.ArrayBuffer((0L, 1L, -1L))
    (1 until k).foreach { r =>
      val (selId, selSim) = best.toSeq.minBy { case (id, bs) => (bs, id) }
      want += ((r.toLong, selId, selSim))
      chosen :+= selId
      best = best.map { case (id, bs) => id -> math.max(bs, simPpm(byId(id), byId(selId))) }
    }
    assert(g2 == want.toSeq, s"got=$g2 want=$want")
    // greedy invariant: selection similarity never decreases after round 1
    assert(g2.drop(1).map(_._3).sliding(2).forall(p => p.head <= p.last), g2.toString)
  }

  test("semDedup prunes higher-id near-identical vectors within a cluster only") {
    val vecs = Seq(
      (1L, Seq(0.10f, 0.10f, 0.00f, 0.00f)), // kept (lowest id of its pair)
      (2L, Seq(0.90f, 0.90f, 1.00f, 1.00f)), // kept
      (3L, Seq(0.10f, 0.10f, 0.00f, 0.00f)), // dup of 1 → pruned
      (4L, Seq(0.90f, 0.90f, 1.00f, 1.00f)), // dup of 2 → pruned
      (5L, Seq(0.00f, 0.00f, 0.30f, 0.00f))  // same cluster as 1, dissimilar → kept
    ).toDF("vec_id", "embedding")
    val r = Clustering.semDedup(vecs, "vec_id", "embedding", k = 2, iters = 2,
        minSimPpm = 990000L)
      .as[(Long, Long, Long)].collect().map(x => x._1 -> x._3).toMap
    assert(r == Map(1L -> 1L, 2L -> 1L, 3L -> 0L, 4L -> 0L, 5L -> 1L), r.toString)
  }

  test("prototypePrune drops the sub-threshold core; ties at the cut survive") {
    // one tight blob around the origin, one around (1,1,1,1); within each,
    // distances to the converged centroid are distinct except a planted tie
    // origin blob: distances to the converged centroid sort as
    // d(1) < d(2) == d(3) < d(4) — the symmetric pair plants a TIE at
    // the p50 cut (rank 2 of 4), so 1 is pruned and 2/3/4 survive
    val vecs = Seq(
      (1L, Seq(0.00f, 0.00f, 0.00f, 0.00f)),
      (2L, Seq(0.20f, 0.00f, 0.00f, 0.00f)),
      (3L, Seq(0.00f, 0.20f, 0.00f, 0.00f)),  // mirror of 2: same dist
      (4L, Seq(0.00f, 0.00f, 0.40f, 0.00f)),
      (5L, Seq(1.00f, 1.00f, 1.00f, 1.00f)),
      (6L, Seq(1.00f, 1.00f, 1.00f, 0.80f)),
      (7L, Seq(1.00f, 0.60f, 1.00f, 1.00f))
    ).toDF("vec_id", "embedding")
    val got = Clustering.prototypePrune(vecs, "vec_id", "embedding",
        k = 2, iters = 3, prunePct = 50, binWidth = 100L)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    // brute replay: per cluster, thr = dist at nearest-rank ceil(n/2);
    // kept iff dist >= thr
    val byCluster = got.groupBy(_._2)
    val expect = byCluster.toSeq.flatMap { case (_, xs) =>
      val ds = xs.map(_._3).sorted
      val thr = ds((ds.length * 50 + 99) / 100 - 1)
      xs.toSeq.map(x => x._1 -> (if (x._3 >= thr) 1L else 0L))
    }.toMap
    got.foreach { case (id, _, _, kept) =>
      assert(kept == expect(id), s"doc $id: kept=$kept want ${expect(id)}") }
    // the planted tie sits exactly AT the cut (rank 2 of 4): both tied
    // members survive together (threshold semantics, never id order),
    // while the sub-threshold core member drops
    val tied = got.filter(r => r._1 == 2L || r._1 == 3L)
    assert(tied.map(_._3).toSet.size == 1, s"tie not planted: $got")
    assert(tied.map(_._4).toSet == Set(1L), s"tied members split fates: $got")
    assert(got.find(_._1 == 1L).get._4 == 0L, s"core member kept: $got")
    // pruning is real on both clusters: something dropped, something kept
    byCluster.values.foreach { xs =>
      assert(xs.map(_._4).toSet == Set(0L, 1L), xs.mkString(",")) }
  }
}
