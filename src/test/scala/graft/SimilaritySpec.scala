package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f)),  // close to 0
    (2L, Seq(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Seq(-1.0f, 0.0f, 0.0f)), // opposite of 0
    (4L, Seq(2.0f, 0.0f, 0.0f))   // same direction as 0, different norm
  ).toDF("id", "vec")

  test("dot / norm / cosine basics") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    assert(df.select(Similarity.dot($"a", $"b")).as[Double].head() == 32.0)
    assert(df.select(Similarity.l2norm($"a")).as[Double].head() == math.sqrt(14.0))
    val c = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f))).toDF("a", "b")
    assert(c.select(Similarity.cosine($"a", $"b")).as[Double].head() == 0.0)
    assert(c.select(Similarity.cosine($"a", $"a")).as[Double].head() == 1.0)
  }

  test("topKExact ranks by cosine, excludes self, deterministic ties") {
    val queries = emb.filter($"id" === 0L).select($"id".as("qid"), $"vec".as("qvec"))
    val top = Similarity.topKExact(emb, queries, "id", "vec", "qid", "qvec", 4)
      .orderBy($"rank").select($"id", $"sim_ppm").as[(Long, Long)].collect()
    // cosine(0,4)=1 > cosine(0,1)≈0.994 > cosine(0,2)=0 > cosine(0,3)=-1
    assert(top.map(_._1).toSeq == Seq(4L, 1L, 2L, 3L))
    assert(top(0)._2 == 1000000L)
    assert(top(2)._2 == 0L)
    assert(top(3)._2 == -1000000L)
  }

  test("rhpSignatures: deterministic, identical for same-direction vectors") {
    val sig = Similarity.rhpSignatures(emb, "id", $"vec", 16).as[(Long, Long)].collect().toMap
    val sig2 = Similarity.rhpSignatures(emb, "id", $"vec", 16).as[(Long, Long)].collect().toMap
    assert(sig == sig2)
    assert(sig(0L) == sig(4L)) // colinear ⇒ same signs on every hyperplane
    assert(sig(0L) != sig(3L)) // opposite ⇒ every sign flips
  }

  test("annTopK finds the colinear neighbor and never the opposite one at rank 1") {
    val queries = emb.filter($"id" === 0L).select($"id".as("qid"), $"vec".as("qvec"))
    val r = Similarity.annTopK(emb, queries, "id", "vec", "qid", "qvec", 3)
      .orderBy($"rank").select($"id").as[Long].collect()
    assert(r.head == 4L) // same bucket guaranteed (identical signature)
    assert(r.nonEmpty && r.toSet.contains(4L))
  }

  test("int8 quantization: bounded codes, small reconstruction error") {
    val df = emb.filter($"id" =!= 3L) // keep a negative-component vector via id=3? removed: zero-safe set
      .unionByName(Seq((9L, Seq(-0.5f, 0.25f, 0.1f))).toDF("id", "vec"))
      .withColumn("_maxabs", Similarity.vecMaxAbs($"vec"))
      .withColumn("_q", Similarity.int8Quantize($"vec", $"_maxabs"))
    val rows = df.select($"id", $"_q",
      Similarity.int8ErrPpm($"vec", $"_q", $"_maxabs").as("err"))
      .as[(Long, Seq[Long], Long)].collect()
    rows.foreach { case (_, q, err) =>
      assert(q.forall(v => v >= -128 && v <= 127))
      assert(err >= 0 && err < 20000, s"err_ppm $err") // < 2% magnitude error
    }
  }

  test("native vec_dot ≡ declarative zip_with/aggregate fold, bit for bit") {
    val rnd = new scala.util.Random(11)
    val rows = (0 until 200).map { i =>
      (i.toLong, Seq.fill(64)((rnd.nextDouble() * 2 - 1).toFloat),
        Seq.fill(64)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val df = rows.toDF("id", "a", "b")
    // float × float
    assert(df.select(Similarity.dot($"a", $"b").as("n"),
        Similarity.dotDeclarative($"a", $"b").as("d"))
      .filter($"n" =!= $"d").count() == 0)
    // double × double and mixed float × double
    val dd = df.select($"a", $"b",
      transform($"a", x => x.cast("double")).as("ad"),
      transform($"b", x => x.cast("double")).as("bd"))
    assert(dd.select(Similarity.dot($"ad", $"bd").as("n"),
        Similarity.dotDeclarative($"ad", $"bd").as("d"))
      .filter($"n" =!= $"d").count() == 0)
    assert(dd.select(Similarity.dot($"a", $"bd").as("n"),
        Similarity.dotDeclarative($"a", $"bd").as("d"))
      .filter($"n" =!= $"d").count() == 0)
    // null contract: mismatched lengths → null (as zip_with's null pad)
    val m = Seq((Seq(1.0f, 2.0f), Seq(1.0f))).toDF("a", "b")
    assert(m.select(Similarity.dot($"a", $"b")).head().isNullAt(0))
  }

  test("precomputed md5 plane coefficients equal the declarative md5 sign") {
    // the SQL oracle derives h_ij from md5('j:i') at query time; the
    // driver-side precompute in rhpSignaturesMd5 must agree on every
    // (j, i) it inlines, or the ANN family silently diverges
    val pairs = for { j <- 0 until 16; i <- Seq(0, 1, 7, 63, 255, 1023) } yield (j, i)
    val sqlSign = pairs.toDF("j", "i").select($"j", $"i",
      when(ascii(substring(md5(concat($"j".cast("string"), lit(":"),
        $"i".cast("string")).cast("binary")), 1, 1)) >= 56, 1.0)
        .otherwise(-1.0).as("c"))
      .as[(Int, Int, Double)].collect()
    sqlSign.foreach { case (j, i, c) =>
      val b = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j:$i".getBytes(java.nio.charset.StandardCharsets.UTF_8))(0)
      val scalaSide = if ((b & 0xFF) >= 0x80) 1.0 else -1.0
      assert(scalaSide == c, s"coefficient mismatch at ($j, $i)")
    }
  }

  test("rhpSignaturesMd5: colinear vectors share signatures, opposite differ") {
    val sig = Similarity.rhpSignaturesMd5(emb, "id", $"vec", 16)
      .as[(Long, Long)].collect().toMap
    assert(sig(0L) == sig(4L))
    assert(sig(0L) != sig(3L))
  }

  test("ivfTopK probes only the nearest centroid bucket at nprobe=1") {
    // centroids = ids {0,1}; bucket c0 = {0, 4} (colinear), everything
    // else lands in c1. Query 0 with nprobe=1 must see ONLY bucket c0 →
    // candidate {4}; the orthogonal/opposite vectors are pruned.
    val queries = emb.filter($"id" === 0L).select($"id".as("qid"), $"vec".as("qvec"))
    val r1 = Similarity.ivfTopK(emb, queries, "id", "vec", "qid", "qvec", 4,
        nCentroids = 2, nprobe = 1)
      .orderBy($"rank").select($"id", $"sim_ppm").as[(Long, Long)].collect()
    assert(r1.map(_._1).toSeq == Seq(4L) && r1.head._2 == 1000000L)
    // nprobe=2 opens both buckets → full exact ranking
    val r2 = Similarity.ivfTopK(emb, queries, "id", "vec", "qid", "qvec", 4,
        nCentroids = 2, nprobe = 2)
      .orderBy($"rank").select($"id").as[Long].collect()
    assert(r2.toSeq == Seq(4L, 1L, 2L, 3L))
  }

  test("ivfIncrementalTopK equals the full ivfTopK rebuild on every split") {
    // a larger deterministic corpus so base and delta are both non-trivial
    val big = (0L until 40L).map { i =>
      (i, Array.tabulate(4)(d => (((i * 31 + d * 17) % 13) - 6).toFloat))
    }.toDF("id", "vec")
    val queries = big.filter($"id" < 3L).select($"id".as("qid"), $"vec".as("qvec"))
    val full = Similarity.ivfTopK(big, queries, "id", "vec", "qid", "qvec", 5,
        nCentroids = 4, nprobe = 2)
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    Seq(pmod($"id", lit(10L)) === 0L, $"id" >= 30L, $"id" < 0L).foreach { pred =>
      val inc = Similarity.ivfIncrementalTopK(big, pred, queries,
          "id", "vec", "qid", "qvec", 5, nCentroids = 4, nprobe = 2)
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(inc == full, s"pred=$pred inc=${inc.take(5)} full=${full.take(5)}")
    }
  }

  test("ivfIncrementalDeleteTopK: tombstoned-merged index equals rebuild; frozen quantizer") {
    val big = (0L until 40L).map { i =>
      (i, Array.tabulate(4)(d => (((i * 31 + d * 17) % 13) - 6).toFloat))
    }.toDF("id", "vec")
    val queries = big.filter($"id" < 3L).select($"id".as("qid"), $"vec".as("qvec"))
    def run(del: org.apache.spark.sql.Column, app: org.apache.spark.sql.Column) =
      Similarity.ivfIncrementalDeleteTopK(big, del, app, queries,
          "id", "vec", "qid", "qvec", 5, nCentroids = 4, nprobe = 2)
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    // 1. empty kill list ≡ the pure-append path (regression guard)
    val appendOnly = Similarity.ivfIncrementalTopK(big,
        pmod($"id", lit(10L)) === 0L, queries,
        "id", "vec", "qid", "qvec", 5, nCentroids = 4, nprobe = 2)
      .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(run($"id" < 0L, pmod($"id", lit(10L)) === 0L) == appendOnly)
    // 2. non-centroid deletes (ids ≥ 20): merged+tombstoned == a full
    //    rebuild over (corpus − deleted) — quantizers coincide because no
    //    centroid-seed row (id < 4) is deleted
    Seq(pmod($"id", lit(10L)) === 9L, $"id" >= 30L).foreach { del =>
      val rebuilt = Similarity.ivfTopK(big.filter(!del), queries,
          "id", "vec", "qid", "qvec", 5, nCentroids = 4, nprobe = 2)
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      val inc = run(del, pmod($"id", lit(10L)) === 0L)
      assert(inc == rebuilt, s"del=$del inc=${inc.take(5)} rebuilt=${rebuilt.take(5)}")
    }
    // 3. deleting a CENTROID-SEED doc (id 3): frozen quantizer keeps its
    //    bucket anchor, but the doc leaves every result — and results
    //    survive (other docs in bucket 3 still reachable)
    val frozen = run($"id" === 3L, pmod($"id", lit(10L)) === 0L)
    assert(frozen.nonEmpty && !frozen.exists(_._3 == 3L), frozen.take(8).toString)
    // 4. COMPACTION: the rewritten index answers identically to the
    //    tombstoned live view on every trail above
    Seq(($"id" < 0L, pmod($"id", lit(10L)) === 0L),
        (pmod($"id", lit(10L)) === 9L, pmod($"id", lit(10L)) === 0L),
        ($"id" === 3L, pmod($"id", lit(10L)) === 0L)).foreach { case (del, app) =>
      val compacted = Similarity.ivfCompactTopK(big, del, app, queries,
          "id", "vec", "qid", "qvec", 5, nCentroids = 4, nprobe = 2)
        .as[(Long, Int, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
      assert(compacted == run(del, app), s"del=$del compacted diverged")
    }
  }

  test("ivfTopK plan has no full-corpus cartesian product") {
    val queries = emb.filter($"id" < 2L).select($"id".as("qid"), $"vec".as("qvec"))
    val plan = Similarity.ivfTopK(emb, queries, "id", "vec", "qid", "qvec", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("embedNearDupPairs finds colinear near-dups, ordered pairs only") {
    val pairs = Similarity.embedNearDupPairs(emb, "id", "vec", minSimPpm = 900000L)
      .select($"id_a", $"id_b", $"sim_ppm").as[(Long, Long, Long)].collect().toSeq
    // identical direction ⇒ identical signature ⇒ every band shared:
    // the (0,4) pair is guaranteed, at exactly cosine 1.0
    assert(pairs.contains((0L, 4L, 1000000L)))
    // opposite/orthogonal pairs are below threshold regardless of banding
    assert(pairs.forall { case (_, _, s) => s >= 900000L })
    assert(pairs.forall { case (a, b, _) => a < b })
  }

  test("embedNearDupPairs plan has no full-corpus cartesian product") {
    val plan = Similarity.embedNearDupPairs(emb, "id", "vec", 900000L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("annTopK plan has no full-corpus cartesian product") {
    val queries = emb.filter($"id" < 2L).select($"id".as("qid"), $"vec".as("qvec"))
    val plan = Similarity.annTopK(emb, queries, "id", "vec", "qid", "qvec", 3)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("multiProbeBlockKeys is a strict superset: exact keys + width perturbations per block") {
    val fp = 0xBEEFL // 16-bit fingerprint
    val row = spark.range(1)
      .select(
        graft.operators.Dedup.simhashBlockKeys(lit(fp), 16, 4).as("exact"),
        Similarity.multiProbeBlockKeys(lit(fp), 16, 4).as("probe"))
      .as[(Seq[String], Seq[String])].head()
    val (exact, probe) = row
    assert(exact.size == 4 && probe.size == 20) // (width + 1) * blocks
    assert(exact.toSet.subsetOf(probe.toSet), "exact keys must all be probed")
    // every perturbed key differs from its block's exact value by one bit
    probe.groupBy(_.split(":")(0)).foreach { case (b, keys) =>
      val base = exact.find(_.startsWith(s"$b:")).get.split(":")(1).toLong
      val others = keys.map(_.split(":")(1).toLong).filterNot(_ == base)
      assert(others.toSet.size == 4 &&
        others.forall(v => java.lang.Long.bitCount(v ^ base) == 1))
    }
  }

  test("embedLeakagePairs flags the planted leak, never test×test or train-only pairs") {
    val train = Seq(
      (10L, Seq(1.0f, 0.0f, 0.0f)),
      (11L, Seq(0.98f, 0.02f, 0.0f)), // near-dup of 10 INSIDE train: must not surface
      (12L, Seq(0.0f, 1.0f, 0.0f))).toDF("id", "vec")
    val test = Seq(
      (20L, Seq(0.99f, 0.01f, 0.0f)), // leaked paraphrase of train 10/11
      (21L, Seq(0.97f, 0.03f, 0.0f)), // leaked too — and close to 20 (test×test bait)
      (22L, Seq(0.0f, 0.0f, 1.0f))).toDF("id", "vec") // clean
    val got = Similarity.embedLeakagePairs(train, test, "id", "vec",
        minSimPpm = 900000L)
      .as[(Long, Long, Long)].collect().toSeq.sortBy(t => (t._1, t._2))
    assert(got.map(p => (p._1, p._2)).toSet == Set(
      (20L, 10L), (20L, 11L), (21L, 10L), (21L, 11L)), got.toString)
    assert(got.forall(_._3 >= 900000L))
  }

  test("knnClassify: majority vote, deterministic tie, held-out split") {
    // train: axis-aligned clusters — label 1 near x-axis (ids 1,2,3),
    // label 2 near y-axis (ids 4,5); eval id 10 points x-ish → 3 of its
    // 5 neighbors are label 1; eval id 13 sits exactly between single
    // votes? give it k=5 over all 5 train → vote 3:2 for label 1
    val emb = Seq(
      (1L, Seq(1.0f, 0.0f), 1), (2L, Seq(0.9f, 0.1f), 1), (3L, Seq(0.8f, 0.2f), 1),
      (4L, Seq(0.0f, 1.0f), 2), (5L, Seq(0.1f, 0.9f), 2),
      (10L, Seq(1.0f, 0.05f), 9), (13L, Seq(0.7f, 0.7f), 1))
      .toDF("vec_id", "embedding", "label")
    val got = Similarity.knnClassify(emb, "vec_id", "embedding", "label",
        col("vec_id") >= 10L, k = 5)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // with k=5 every eval sees all 5 train vectors: vote 3 (label 1) vs
    // 2 (label 2) → predicted 1 for both; id 10's true label 9 ≠ 1
    assert(got(10L) == ((10L, 9L, 1L, 3L, 0L)), got.toString)
    assert(got(13L) == ((13L, 1L, 1L, 3L, 1L)), got.toString)
    // vote tie at k=4? id 13 equidistant-ish: use k=2 on a symmetric
    // probe to force a 1:1 tie → smaller label wins
    val got2 = Similarity.knnClassify(emb.filter(col("vec_id").isin(1L, 4L, 13L)),
        "vec_id", "embedding", "label", col("vec_id") === 13L, k = 2)
      .as[(Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(got2(13L)._3 == 1L && got2(13L)._4 == 1L, got2.toString)
  }

  test("dimRobustStats: outlier census flags the planted fat tail only") {
    // dim 0: nine tight values + one huge outlier; dim 1: constant
    // (IQR 0 → threshold max(0,1)=1 → everything within 1 of the median
    // is clean)
    val vecs = (1L to 9L).map(i => (i, Seq((i * 0.001).toFloat, 0.5f))) :+
      ((10L, Seq(5.0f, 0.5f)))
    val got = Similarity.dimRobustStats(vecs.toDF("id", "vec"), "id", "vec")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    val q = (1L to 9L).map(i => math.floor((i * 0.001).toFloat.toDouble * 1e6).toLong)
      .sorted
    // nearest-rank over the 10 sorted dim-0 values (outlier last):
    // p25 = rank ceil(2.5)=3, p50 = rank 5, p75 = rank ceil(7.5)=8
    val all0 = (q :+ 5000000L).sorted
    val (p25, p50, p75) = (all0(2), all0(4), all0(7))
    assert(got(0L) == ((10L, p25, p50, p75, p75 - p25, 1L)), got.toString)
    val (_, _, c50, _, ciqr, cout) = got(1L)
    assert(ciqr == 0L && cout == 0L && c50 == math.floor(0.5f.toDouble * 1e6).toLong,
      got.toString)
  }

  test("hardNegatives: planted confusable twin wins, margin sign, ties to smaller id") {
    // anchor 0 (label 0): id 10 is a different-label near-clone (the
    // hard negative), id 1 a same-label orthogonal (the hard positive).
    val emb = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f), 0),
      (1L, Seq(0.0f, 1.0f, 0.0f), 0),  // same label, orthogonal → hardest positive
      (2L, Seq(0.8f, 0.6f, 0.0f), 0),  // same label, closer than 1
      (10L, Seq(1.0f, 0.0f, 0.0f), 1), // different label, identical direction
      (11L, Seq(0.0f, 0.0f, 1.0f), 1)
    ).toDF("vec_id", "embedding", "label")
    val got = Similarity.hardNegatives(emb, "vec_id", "embedding", "label",
      col("vec_id") === 0L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (aId, aLab, negId, negSim, posId, posSim, margin) = got.head
    assert((aId, aLab) == ((0L, 0L)))
    assert(negId == 10L && negSim == 1000000L) // identical direction, sim = 1
    assert(posId == 1L && posSim == 0L)        // orthogonal same-label
    assert(margin == -1000000L)                // violated triplet
    // tie case: two identical hardest negatives → smaller id wins
    val tied = emb.unionByName(Seq((9L, Seq(1.0f, 0.0f, 0.0f), 1))
      .toDF("vec_id", "embedding", "label"))
    val t = Similarity.hardNegatives(tied, "vec_id", "embedding", "label",
      col("vec_id") === 0L)
      .select($"neg_id").as[Long].head()
    assert(t == 9L)
  }

  test("hardNegatives equals brute-force model on random labeled vectors") {
    val vecs = (1L to 60L).map { i =>
      (i, (0 until 4).map(d => (((i * 7919L + d * 104729L) % 2001L) - 1000L).toFloat / 100f),
        (i % 5L).toInt)
    }
    val got = Similarity.hardNegatives(
        vecs.toDF("vec_id", "embedding", "label"),
        "vec_id", "embedding", "label", pmod(col("vec_id"), lit(10L)) === 0L)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    def simPpm(a: Seq[Float], b: Seq[Float]): Long = {
      def dot(x: Seq[Float], y: Seq[Float]) =
        x.zip(y).foldLeft(0.0)((acc, p) => acc + p._1.toDouble * p._2.toDouble)
      math.floor(dot(a, b) / (math.sqrt(dot(a, a)) * math.sqrt(dot(b, b))) * 1e6).toLong
    }
    val anchors = vecs.filter(_._1 % 10 == 0)
    assert(got.keySet == anchors.map(_._1).toSet)
    anchors.foreach { case (aid, avec, alab) =>
      val others = vecs.filter(_._1 != aid)
      val neg = others.filter(_._3 != alab)
        .map(v => (v._1, simPpm(avec, v._2))).minBy(p => (-p._2, p._1))
      val pos = others.filter(v => v._3 == alab)
        .map(v => (v._1, simPpm(avec, v._2))).minBy(p => (p._2, p._1))
      assert(got(aid) == ((aid, alab.toLong, neg._1, neg._2, pos._1, pos._2,
        pos._2 - neg._2)), s"anchor $aid")
    }
  }

  test("dimRobustStats equals brute nearest-rank model on random vectors") {
    val vecs = (1L to 50L).map { i =>
      (i, (0 until 4).map(d => (((i * 7919L + d * 104729L) % 2001L) - 1000L).toFloat / 100f))
    }
    val got = Similarity.dimRobustStats(vecs.toDF("id", "vec"), "id", "vec")
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    (0 until 4).foreach { d =>
      val vs = vecs.map(v => math.floor(v._2(d).toDouble * 1e6).toLong)
      val sorted = vs.sorted
      def rank(p: Double) = sorted(math.ceil(vs.size * p).toInt - 1)
      val (p25, p50, p75) = (rank(0.25), rank(0.50), rank(0.75))
      val iqr = p75 - p25
      val outs = vs.count(v => math.abs(v - p50) > math.max(3 * iqr, 1L)).toLong
      assert(got(d.toLong) == ((50L, p25, p50, p75, iqr, outs)),
        s"dim=$d got=${got(d.toLong)} want=${(50L, p25, p50, p75, iqr, outs)}")
    }
  }

  test("splitHalfCentroidDrift: identical/orthogonal/opposite halves, single-half dropped") {
    val rows = Seq(
      // label 0: both halves sum to the same vector -> cos = 1
      (0L, 0, Array(1.0f, 2.0f)), (1L, 0, Array(1.0f, 2.0f)),
      (2L, 0, Array(3.0f, 1.0f)), (3L, 0, Array(3.0f, 1.0f)),
      // label 1: even along x, odd along y -> cos = 0
      (10L, 1, Array(1.0f, 0.0f)), (11L, 1, Array(0.0f, 1.0f)),
      // label 2: opposite -> cos = -1
      (20L, 2, Array(1.0f, 0.0f)), (21L, 2, Array(-1.0f, 0.0f)),
      // label 3: only even ids -> no pairable half, dropped
      (30L, 3, Array(1.0f, 1.0f)))
      .toDF("vec_id", "label", "embedding")
    val got = graft.operators.Similarity
      .splitHalfCentroidDrift(rows, "vec_id", "embedding", "label")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got == Map(
      0L -> ((2L, 2L, 1000000L)),
      1L -> ((1L, 1L, 0L)),
      2L -> ((1L, 1L, -1000000L))), got.toString)
  }

  test("splitHalfCentroidDrift equals BigInt brute replay (negative quantization included)") {
    val rnd = new scala.util.Random(19)
    val rows = (0 until 120).map { i =>
      (i.toLong, i % 3, Array.fill(8)((rnd.nextDouble() * 2 - 1).toFloat))
    }
    val got = graft.operators.Similarity
      .splitHalfCentroidDrift(rows.toDF("vec_id", "label", "embedding"),
        "vec_id", "embedding", "label")
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    val brute = (0 until 3).map { l =>
      val (ev, od) = rows.filter(_._2 == l).partition(_._1 % 2 == 0)
      def qsum(vs: Seq[Array[Float]]): Array[BigInt] =
        (0 until 8).map(d => vs.map(v =>
          BigInt(math.floor(v(d).toDouble * 1024).toLong)).sum).toArray
      val (sa, sb) = (qsum(ev.map(_._3)), qsum(od.map(_._3)))
      val num = (0 until 8).map(d => sa(d) * sb(d)).sum
      val da = (0 until 8).map(d => sa(d) * sa(d)).sum
      val db = (0 until 8).map(d => sb(d) * sb(d)).sum
      val ppm = if (da > 0 && db > 0)
        num.signum * ((num * num * 1000000) / (da * db)).toLong else 0L
      l.toLong -> ((ev.size.toLong, od.size.toLong, ppm))
    }.toMap
    assert(got == brute, s"got=$got brute=$brute")
  }

  test("labelOutliers: planted mislabel surfaces first; brute replay agrees") {
    val rnd = new scala.util.Random(29)
    // class 0 clusters near +x, class 1 near +y; vector 99 is a class-1
    // point mislabeled as class 0 -> lowest own-centroid cosine
    val rows = (0 until 40).map { i =>
      val l = i % 2
      val base = if (l == 0) Array(1.0f, 0.05f, 0.0f) else Array(0.0f, 1.0f, 0.05f)
      (i.toLong, l, base.map(v => v + (rnd.nextFloat() - 0.5f) * 0.1f))
    } :+ ((99L, 0, Array(0.0f, 1.0f, 0.0f)))
    val got = graft.operators.Similarity.labelOutliers(
        rows.toDF("vec_id", "label", "embedding"),
        "vec_id", "embedding", "label", topK = 5)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.head._1 == 99L, got.mkString(","))
    // brute replay of the full ranking
    def q(v: Float): BigInt = BigInt(math.floor(v.toDouble * 1024).toLong)
    val sums = rows.groupBy(_._2).view.mapValues { vs =>
      (0 until 3).map(d => vs.map(r => q(r._3(d))).sum)
    }.toMap
    val counts = rows.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val brute = rows.map { case (id, l, v) =>
      val s = sums(l)
      val num = (0 until 3).map(d => q(v(d)) * s(d)).sum
      val dq = (0 until 3).map(d => q(v(d)) * q(v(d))).sum
      val ds = (0 until 3).map(d => s(d) * s(d)).sum
      val ppm = if (dq > 0 && ds > 0)
        num.signum * ((num * num * 1000000) / (dq * ds)).toLong else 0L
      (id, l.toLong, counts(l), ppm)
    }.sortBy(r => (r._4, r._1)).take(5)
    assert(got.toSeq == brute, s"got=${got.toSeq} brute=$brute")
  }

  test("mmrRerank: diversity beats raw relevance, greedy trail exact") {
    // A(rel 90) picked first; C(rel 80, far from A) beats B(rel 85,
    // near-dup of A) in round 2; B last with score 85 - max(70, 20) = 15
    val cands = Seq((1L, 10L, 90L), (1L, 11L, 85L), (1L, 12L, 80L))
      .toDF("q_id", "cand_id", "rel_ppm")
    val sym = Seq((10L, 11L, 70L), (10L, 12L, 10L), (11L, 12L, 20L))
    val pairs = (sym ++ sym.map(p => (p._2, p._1, p._3)))
      .map(p => (1L, p._1, p._2, p._3))
      .toDF("q_id", "a_id", "b_id", "psim_ppm")
    val got = Similarity.mmrRerank(cands, pairs, "q_id", "cand_id", 3)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq((1L, 1L, 10L, 90L), (1L, 2L, 12L, 70L), (1L, 3L, 11L, 15L)),
      got.toString)
  }

  test("mmrRerank: score ties break to the smaller candidate id") {
    val cands = Seq((1L, 20L, 50L), (1L, 21L, 50L), (1L, 22L, 40L))
      .toDF("q_id", "cand_id", "rel_ppm")
    val sym = Seq((20L, 21L, 30L), (20L, 22L, 30L), (21L, 22L, 30L))
    val pairs = (sym ++ sym.map(p => (p._2, p._1, p._3)))
      .map(p => (1L, p._1, p._2, p._3))
      .toDF("q_id", "a_id", "b_id", "psim_ppm")
    val got = Similarity.mmrRerank(cands, pairs, "q_id", "cand_id", 2)
      .orderBy("rank").as[(Long, Long, Long, Long)].collect().toSeq
    // rank 1: rel tie 50/50 -> id 20; rank 2: 21 scores 50-30=20 beats 22's 40-30=10
    assert(got == Seq((1L, 1L, 20L, 50L), (1L, 2L, 21L, 20L)), got.toString)
  }

  test("classMetrics: hand confusion table, one-sided classes get rows") {
    import org.apache.spark.sql.functions.col
    // true:  a a a b b c    pred: a b a b b a
    // class a: tp=2, n_true=3, n_pred=3 -> P=R=F1=2/3
    // class b: tp=2, n_true=2, n_pred=3 -> P=2/3, R=1, F1=4/5
    // class c: tp=0, n_true=1, n_pred=0 -> P NULL, R=0, F1=0
    val pred = Seq((1L, 1L), (1L, 2L), (1L, 1L), (2L, 2L), (2L, 2L), (3L, 1L))
      .toDF("t", "p")
    val got = Similarity.classMetrics(pred, col("t"), col("p"))
      .as[(Long, Long, Long, Long, Option[Long], Option[Long], Option[Long])]
      .collect().map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6, r._7))).toMap
    assert(got(1L) == ((3L, 3L, 2L, Some(666666L), Some(666666L), Some(666666L))), got.toString)
    assert(got(2L) == ((2L, 3L, 2L, Some(666666L), Some(1000000L), Some(800000L))), got.toString)
    assert(got(3L) == ((1L, 0L, 0L, None, Some(0L), Some(0L))), got.toString)
  }

  test("mutualNnPairs: brute replay exact; one-directional neighbors excluded") {
    import org.apache.spark.sql.functions.col
    // 0 and 1 are mutual twins; 2's NN is 0 but 0's NN is 1 (one-way);
    // 3 is a far outlier whose NN is nobody's NN
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f)),
      (1L, Array(0.99f, 0.01f, 0.0f)),
      (2L, Array(0.9f, 0.3f, 0.0f)),
      (3L, Array(0.0f, 0.0f, 1.0f))).toDF("vec_id", "embedding")
    val got = Similarity.mutualNnPairs(vecs, "vec_id", "embedding")
      .orderBy("id_a").as[(Long, Long, Long)].collect().toSeq
    def cos(a: Array[Float], b: Array[Float]): Double = {
      def d(x: Array[Float], y: Array[Float]) =
        x.zip(y).map { case (p, q) => p.toDouble * q.toDouble }.sum
      d(a, b) / math.sqrt(d(a, a) * d(b, b))
    }
    val m = Seq(0L -> Array(1.0f, 0.0f, 0.0f), 1L -> Array(0.99f, 0.01f, 0.0f),
      2L -> Array(0.9f, 0.3f, 0.0f), 3L -> Array(0.0f, 0.0f, 1.0f)).toMap
    def nn(i: Long) = m.keys.filter(_ != i)
      .map(j => (j, math.floor(cos(m(i), m(j)) * 1e6).toLong))
      .minBy { case (j, s) => (-s, j) }
    val want = m.keys.toSeq.sorted.flatMap { a =>
      val (b, s) = nn(a)
      if (a < b && nn(b)._1 == a) Some((a, b, s)) else None
    }
    assert(got == want && got.map(p => (p._1, p._2)) == Seq((0L, 1L)), got.toString)
  }

  test("mutualNnPairsAnn == brute on a spread fixture; no cartesian product") {
    // 24 deterministic 8-dim vectors (md5-derived components): large
    // enough that buckets differentiate, small enough to brute-check
    val vecs = (0L until 24L).map { i =>
      (i, (0 until 8).map { d =>
        val b = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$i:$d".getBytes("UTF-8"))(0)
        ((b & 0xFF) - 128) / 128.0f
      })
    }.toDF("id", "vec")
    val brute = Similarity.mutualNnPairs(vecs, "id", "vec")
      .as[(Long, Long, Long)].collect().toSet
    val ann = Similarity.mutualNnPairsAnn(vecs, "id", "vec")
    val got = ann.as[(Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty, "fixture produced no mutual pairs — weaken it")
    assert(got == brute, s"ann=$got brute=$brute")
    assert(!ann.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("hardNegativesAnn == brute negatives on the fixture; no cartesian product") {
    val vecs = (0L until 24L).map { i =>
      (i, (0 until 8).map { d =>
        val b = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$i:$d".getBytes("UTF-8"))(0)
        ((b & 0xFF) - 128) / 128.0f
      }, i % 3) // 3 labels
    }.toDF("id", "vec", "label")
    val anchorF = $"id" % 5 === 0
    val brute = Similarity.hardNegatives(vecs, "id", "vec", "label", anchorF)
      .select($"a_id", $"a_label", $"neg_id", $"neg_sim_ppm")
      .as[(Long, Long, Long, Long)].collect().toSet
    val ann = Similarity.hardNegativesAnn(vecs, "id", "vec", "label", anchorF)
    val got = ann.as[(Long, Long, Long, Long)].collect().toSet
    assert(got == brute, s"ann=$got brute=$brute")
    assert(!ann.queryExecution.executedPlan.toString.contains("CartesianProduct"))
  }

  test("clusteredEmbeddings: planted separation, md5-sign centers, derived count") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cl = Similarity.clusteredEmbeddings(emb, "vec_id", "embedding")
    // 500 vectors -> 8 derived clusters, balanced to ±1
    val sizes = cl.groupBy($"cluster").count().as[(Long, Long)].collect().toMap
    assert(sizes.keySet == (0L until 8L).toSet && sizes.values.forall(n => n >= 62 && n <= 63), sizes)
    // the center sign matrix replays the documented md5 formula
    val b00 = java.security.MessageDigest.getInstance("MD5")
      .digest("ctr:0:0".getBytes("UTF-8"))(0)
    val v0 = cl.filter($"vec_id" === 0L).select($"embedding").as[Seq[Double]].head()
    val raw0 = emb.filter($"vec_id" === 0L).select($"embedding")
      .as[Seq[Float]].head()
    val expectedSign = if ((b00 & 0xFF) >= 0x80) 1.0 else -1.0
    assert(math.abs(v0.head - (expectedSign + 0.25 * raw0.head.toDouble)) == 0.0)
    // separation: within-cluster cosine far above cross-cluster
    val sims = cl.as("a").join(cl.as("b"), col("a.vec_id") < col("b.vec_id"))
      .filter(col("a.vec_id") < 50 && col("b.vec_id") < 50)
      .select((col("a.cluster") === col("b.cluster")).as("same"),
        Similarity.cosinePpm(col("a.embedding"), col("b.embedding")).as("s"))
      .groupBy($"same").agg(min($"s").as("mn"), max($"s").as("mx"))
      .as[(Boolean, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(sims(true)._1 > 800000L, s"within-cluster min too low: $sims")
    assert(sims(false)._2 < 450000L, s"cross-cluster max too high: $sims")
  }

  test("mutualNnClusteredTuned == brute on the clustered fixture; sparse point picked") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cl = Similarity.clusteredEmbeddings(emb, "vec_id", "embedding")
    val brute = Similarity.mutualNnPairs(cl, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect().toSet
    val tuned = Similarity.mutualNnClusteredTuned(cl, "vec_id", "embedding")
    val got = tuned.as[(Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(got == brute,
      s"missing=${(brute diff got).size} spurious=${(got diff brute).size}")
    assert(!tuned.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    // the design table itself: full-recall configs exist and recall is
    // monotone in band count (more, narrower bands -> more candidates)
    val sample = cl.filter($"vec_id" % 4 === 1)
    val design = Similarity.rhpTuning(sample, "vec_id", "embedding",
        Seq((16, 8), (16, 4), (8, 4), (8, 2)), 700000L)
      .orderBy($"nbits".desc, $"bands".desc)
      .as[(Long, Long, Long, Long, Long, Option[Long], Option[Long])].collect()
    assert(design.length == 4)
    assert(design.forall(_._4 > 0L), s"no true pairs in the design sample: ${design.toSeq}")
    assert(design.exists(r => r._6.contains(1000000L)),
      s"no full-recall config: ${design.toSeq}")
  }

  test("mutualNnTuned: near-random corpus demands the dense fallback; == brute") {
    // the q_mutual_nn registration (VERDICT r13 Next #3): the operating
    // point is chosen at runtime by the bounded design sample — on the
    // NEAR-RANDOM embeddings (ANN's adversarial case) the sample must
    // reject IVF-only and find no >= 0.7-cosine design truth (n_true = 0
    // no longer counts as full recall), landing on the dense
    // zero-mismatch point; the result replays the brute frame exactly
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val brute = Similarity.mutualNnPairs(emb, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect().toSet
    val tuned = Similarity.mutualNnTuned(emb, "vec_id", "embedding",
      fallbackCentroids = 8, fallbackNprobe = 2)
    val got = tuned.as[(Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(got == brute,
      s"missing=${(brute diff got).size} spurious=${(got diff brute).size}")
    assert(!tuned.queryExecution.executedPlan.toString.contains("CartesianProduct"))
    // the dense sample genuinely demands the fallback: IVF-only on the
    // sample is NOT at parity (otherwise this fixture stops guarding the
    // decision and the test must move to a harder corpus)
    val sample = emb.filter($"vec_id" % 4 === 1)
    val cent = emb.filter($"vec_id" < 8)
      .select($"vec_id".cast("long").as("cid"), $"embedding".as("_cvec"))
    val sBrute = Similarity.mutualNnPairs(sample, "vec_id", "embedding")
      .as[(Long, Long, Long)].collect().toSet
    val sIvf = Similarity.mutualNnPairsAnn(sample, "vec_id", "embedding",
        nCentroids = 8, nprobe = 1, bands = 0)
      .as[(Long, Long, Long)].collect().toSet
    assert(sIvf != sBrute || sBrute.isEmpty,
      "sample IVF-only reached parity on the near-random fixture — " +
        "the dense-fallback branch is no longer exercised here")
    assert(cent.count() == 8)
  }

  test("embedLeakagePairsIvf == brute threshold pairs on the clustered fixture") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val cl = Similarity.clusteredEmbeddings(emb, "vec_id", "embedding")
    val isTest = $"vec_id" % 10 === 7
    val train = cl.filter(!isTest)
    val test = cl.filter(isTest)
    // brute truth: every test x train pair at >= 0.70 cosine — the
    // recall bar the IVF candidates must clear exactly (the SQL oracle
    // REPLAYS the assignment, so only this brute diff would catch an
    // assignment-split recall loss, e.g. a quantizer seeded from one
    // split orphaning a cluster)
    val brute = test.as("t").join(train.as("r"), expr("true"))
      .select(col("t.vec_id").as("test_id"), col("r.vec_id").as("train_id"),
        Similarity.cosinePpm(col("t.embedding"), col("r.embedding")).as("sim_ppm"))
      .filter($"sim_ppm" >= 700000L)
      .as[(Long, Long, Long)].collect().toSet
    val got = Similarity.embedLeakagePairsIvf(train, test, "vec_id", "embedding",
        minSimPpm = 700000L,
        centroids = Similarity.clusterCentroids(cl, "vec_id", "embedding"))
      .as[(Long, Long, Long)].collect().toSet
    assert(brute.nonEmpty)
    assert(got == brute,
      s"missing=${(brute diff got).size} spurious=${(got diff brute).size}")
  }

  test("pqAdcCandidates: equals the full ADC ranking's top-m; self excluded; rank-prefix") {
    import graft.operators.Clustering
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val (enc, books) = Clustering.pqEncode(emb, "vec_id", "embedding", 64, 8, 16, 2)
    val qq = emb.select($"vec_id", Clustering.quantizeMils($"embedding").as("_qv"))
    val m = 5
    val cands = Clustering.pqAdcCandidates(enc, qq, "vec_id", books, 64, m)
      .as[(Long, Long, Int)].collect()
    assert(cands.forall(c => c._1 != c._2), "self-match leaked into candidates")
    val bySrc = cands.groupBy(_._1).view.mapValues(_.sortBy(_._3)).toMap
    assert(bySrc.values.forall(_.length <= m))
    // ranks are the contiguous 1..len prefix — filtering rank <= m' IS
    // the top-m' (the budget-sweep contract)
    assert(bySrc.values.forall(r => r.map(_._3).toSeq == (1 to r.length)))
    // oracle: the FULL ADC ranking over the same codes/books (pqTopK at
    // topK = n), self rows dropped, re-ranked by (dist, id) — the top-m
    // prefix per src must match candidates and ranks exactly
    val n = emb.count().toInt
    val full = Clustering.pqTopK(enc,
        qq.select($"vec_id".as("q"), $"_qv"), "q", "vec_id", books, 64, n)
      .filter($"q" =!= $"vec_id")
      .select($"q", $"vec_id", $"adc_dist").as[(Long, Long, Long)].collect()
    val oracle = full.groupBy(_._1).map { case (q, rows) =>
      q -> rows.sortBy(r => (r._3, r._2)).take(m).toSeq
        .zipWithIndex.map { case (r, i) => (r._2, i + 1) }
    }
    assert(bySrc.keySet == oracle.keySet)
    bySrc.foreach { case (src, rows) =>
      assert(rows.map(r => (r._2, r._3)).toSeq == oracle(src),
        s"src=$src: ${rows.toSeq} vs ${oracle(src)}")
    }
  }

  test("mutualNnPairsPq == brute when clusters fit the candidate budget") {
    // 3 tight, far-apart clusters of 4 vectors in 8 dims with paired
    // jitters: per cluster the mutual top-1 pairs are (c, c+3) and
    // (c+6, c+9). Quantization may collapse a cluster to one code, but
    // with m >= cluster size the ADC top-m always contains the true
    // top-1, so exact verify + the mutual filter reproduce brute.
    val base = Seq(
      Array(10f, 0f, 0f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 10f, 0f, 0f, 0f, 0f, 0f),
      Array(0f, 0f, 0f, 0f, 0f, 10f, 0f, 0f))
    val jit = Seq(0f, 0.001f, 0.5f, 0.501f)
    val vecs = (0 until 12).map { i =>
      val b = base(i % 3).clone()
      b(7) = jit(i / 3)
      (i.toLong, b.toSeq)
    }.toDF("id", "vec")
    val brute = Similarity.mutualNnPairs(vecs, "id", "vec")
      .as[(Long, Long, Long)].collect().toSet
    assert(brute.size == 6, s"fixture drifted: $brute")
    val got = Similarity.mutualNnPairsPq(vecs, "id", "vec", dims = 8,
        subspaces = 4, kCodes = 4, iters = 2, m = 4)
      .as[(Long, Long, Long)].collect().toSet
    assert(got == brute,
      s"missing=${(brute diff got).size} spurious=${(got diff brute).size}")
  }

  test("annFilteredTopK: widened nprobe is exact over survivors at the cap") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val pred = pmod($"vec_id", lit(16L)) === 1L
    val queries = emb.filter($"vec_id" < 5)
      .select($"vec_id".as("q_id"), $"embedding".as("q_vec"))
    val truth = Similarity.topKExact(emb.filter(pred), queries,
        "vec_id", "embedding", "q_id", "q_vec", 10)
      .as[(Long, Int, Long, Long)].collect().toSet
    // 1/16 selectivity widens nprobe 2 -> min(8, 2*16) = 8 = nC: the
    // probe set covers every bucket, so the filtered search must equal
    // the brute-filtered top-k EXACTLY (rank, id and sim included)
    val contract = Similarity.annFilteredTopK(emb, pred, queries,
        "vec_id", "embedding", "q_id", "q_vec", 10,
        nCentroids = 8, nprobe = 2)
      .as[(Long, Int, Long, Long)].collect().toSet
    assert(truth.nonEmpty)
    assert(contract == truth,
      s"missing=${(truth diff contract).size} spurious=${(contract diff truth).size}")
    // the naive fixed-nprobe path is a strict candidate subset — its
    // hits never exceed the contract path's
    val naive = Similarity.annFilteredTopK(emb, pred, queries,
        "vec_id", "embedding", "q_id", "q_vec", 10,
        nCentroids = 8, nprobe = 2, widen = Some(1L))
      .as[(Long, Int, Long, Long)].collect().toSet
    assert((naive diff contract).forall { case (q, _, id, s) =>
      // a naive row absent from truth can only be a lower-sim filler
      truth.exists { case (tq, _, _, ts) => tq == q && ts >= s }
    })
  }

  test("mutualNnTuned ledger: earned once, hit reproduces, content-keyed") {
    val emb = graft.sources.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val dir = new java.io.File(
      s"${graft.store.SnapshotStore.root}/_mnn_tune")
    graft.store.SnapshotStore.deleteRecursively(dir)
    def entries() = Option(dir.listFiles())
      .getOrElse(Array.empty[java.io.File])
      .filter(_.getName.endsWith(".txt"))
    val r1 = Similarity.mutualNnTuned(emb, "vec_id", "embedding",
        fallbackCentroids = 8, fallbackNprobe = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(entries().length == 1, "first invocation must earn ONE entry")
    val decision = new String(java.nio.file.Files.readAllBytes(
      entries().head.toPath)).trim
    // the near-random fixture demands the dense fallback (and the PQ
    // pre-check must have refuted, not earned, on it)
    assert(decision == "dense", decision)
    // ledger hit: same corpus, same frame, no new entry
    val r2 = Similarity.mutualNnTuned(emb, "vec_id", "embedding",
        fallbackCentroids = 8, fallbackNprobe = 2)
      .as[(Long, Long, Long)].collect().toSet
    assert(r2 == r1)
    assert(entries().length == 1)
    // content-keyed: a perturbed corpus fingerprints differently and
    // earns its own entry
    val emb2 = emb.withColumn("embedding",
      transform($"embedding", x => x + lit(1.0f)))
    Similarity.mutualNnTuned(emb2, "vec_id", "embedding",
        fallbackCentroids = 8, fallbackNprobe = 2)
      .as[(Long, Long, Long)].collect()
    assert(entries().length == 2, "perturbed corpus must earn a new entry")
  }
}
