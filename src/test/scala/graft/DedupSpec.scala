package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"), // near-dup of 0
    (2L, "completely different words entirely here now today"),
    (3L, "the quick brown fox jumps over the lazy dog")  // exact dup of 0
  ).toDF("id", "text").withColumn("_toks", split($"text", " "))

  test("tokenShingles builds n-grams; short texts give empty array") {
    val sh = Seq((1L, "a b c d"), (2L, "a b")).toDF("id", "text")
      .withColumn("_toks", split($"text", " "))
      .select($"id", Dedup.tokenShingles($"_toks", 3).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(1L) == Seq("a b c", "b c d"))
    assert(sh(2L).isEmpty)
  }

  test("exactDupGroups groups identical texts and keeps min id") {
    val g = Dedup.exactDupGroups(docs, "id", "text")
    val dup = g.filter($"n_copies" === 2).select($"keeper_id").as[Long].collect()
    assert(dup.toSeq == Seq(0L))
    assert(g.count() == 3) // 3 distinct texts
  }

  test("jaccardPpm: identical sets 1e6, disjoint 0, known overlap exact") {
    val df = Seq((Seq("a", "b", "c"), Seq("a", "b", "d"))).toDF("x", "y")
    val j = df.select(Dedup.jaccardPpm($"x", $"y")).as[Long].head()
    assert(j == 2L * 1000000L / 4L) // |∩|=2, |∪|=4
    assert(df.select(Dedup.jaccardPpm($"x", $"x")).as[Long].head() == 1000000L)
    val dis = Seq((Seq("a"), Seq("b"))).toDF("x", "y")
    assert(dis.select(Dedup.jaccardPpm($"x", $"y")).as[Long].head() == 0L)
  }

  test("native jaccard_ppm expression ≡ declarative jaccardPpm (differential)") {
    val rnd = new scala.util.Random(42)
    val rows = (1 to 200).map { _ =>
      def arr() = Seq.fill(rnd.nextInt(8))(s"w${rnd.nextInt(6)}")
      (arr(), arr())
    }.filter { case (a, b) => a.nonEmpty || b.nonEmpty } // 0/0 → NULL vs 0 differ by design
    val df = rows.toDF("a", "b")
    val cmp = df.select(
      graft.functions.SetOps.jaccardPpmCol($"a", $"b").as("native"),
      Dedup.jaccardPpm($"a", $"b").as("decl"))
      .collect()
    cmp.foreach { r =>
      val decl = if (r.isNullAt(1)) 0L else r.getLong(1) // both empty: declarative NULL
      assert(r.getLong(0) == decl, r)
    }
  }

  test("minhash LSH surfaces near-dup and exact-dup candidate pairs") {
    val sig = Dedup.minhashSignatures(docs, "id", Dedup.tokenShingles($"_toks", 3), 64)
    val cands = Dedup.candidatePairs(sig, "id", Dedup.lshBandKeys($"sig", 16, 4))
      .as[(Long, Long)].collect().toSet
    assert(cands.contains((0L, 3L))) // identical signature → all bands collide
    assert(cands.contains((0L, 1L))) // jaccard 7/11 ≈ 0.64 → ≥1 of 16 bands w.h.p.
    assert(!cands.contains((0L, 2L)) && !cands.contains((1L, 2L)))
  }

  test("identical docs get identical minhash signatures") {
    val sig = Dedup.minhashSignatures(docs, "id", Dedup.tokenShingles($"_toks", 3), 32)
      .as[(Long, Seq[Long])].collect().toMap
    assert(sig(0L) == sig(3L))
    assert(sig(0L) != sig(2L))
  }

  test("simhash32: exact dup → distance 0; near-dup closer than unrelated") {
    val fp = Dedup.simhash32Frame(docs, "id", $"_toks").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0L), fp(3L)) == 0)
    assert(ham(fp(0L), fp(1L)) < ham(fp(0L), fp(2L)))
  }

  test("simhash64: same invariants with the xxhash64 family") {
    val fp = Dedup.simhash64Frame(docs, "id", $"_toks").as[(Long, Long)].collect().toMap
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fp(0L), fp(3L)) == 0)
    assert(ham(fp(0L), fp(1L)) < ham(fp(0L), fp(2L)))
  }

  test("charShingles: known 5-grams") {
    val g = Seq((1L, "abcdef")).toDF("id", "text")
      .select(Dedup.charShingles($"text", 5).as("g")).as[Seq[String]].head()
    assert(g == Seq("abcde", "bcdef"))
  }

  test("native charShingles ≡ declarative (differential, incl. unicode + dups)") {
    val rnd = new scala.util.Random(13)
    // small alphabet forces duplicate shingles; multibyte chars exercise
    // the byte-offset path (substr counts chars, not bytes)
    val alphabet = "abcde éλ中"
    val rows = (1 to 300).map { i =>
      val len = rnd.nextInt(40)
      (i.toLong, Seq.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    for (n <- Seq(2, 3, 5)) {
      val cmp = rows.toDF("id", "text")
        .select(
          Dedup.charShingles($"text", n).as("native"),
          Dedup.charShinglesDeclarative($"text", n).as("decl"))
        .as[(Seq[String], Seq[String])].collect()
      cmp.foreach { case (native, decl) => assert(native == decl) }
    }
  }

  test("charShingles: NULL text → NULL; short text → empty; SQL registration") {
    org.apache.spark.sql.graftbridge.registerFunctions(spark)
    val r = sql(
      """SELECT char_shingles(CAST(NULL AS STRING), 3) AS a, char_shingles('ab', 3) AS b,
        |       char_shingles('abab', 2) AS c""".stripMargin).head()
    assert(r.isNullAt(0))
    assert(r.getSeq[String](1).isEmpty)
    assert(r.getSeq[String](2) == Seq("ab", "ba")) // dedup keeps first occurrence
  }

  test("charShinglesAll keeps every position (differential vs sliding)") {
    val rnd = new scala.util.Random(17)
    val alphabet = "abcé中"
    val rows = (1 to 200).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
    for (n <- Seq(2, 4)) {
      val cmp = rows.toDF("id", "text")
        .select($"text", graft.functions.SetOps.charShinglesAllCol($"text", n).as("all"))
        .as[(String, Seq[String])].collect()
      cmp.foreach { case (text, all) =>
        val expect = if (text.length < n) Seq.empty else text.sliding(n).toSeq
        assert(all == expect, s"text '$text' n=$n")
      }
    }
  }

  test("winnowFrame equals a reference winnowing implementation") {
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val k = 3
    val w = 2
    val docs = Seq((1L, "abcabcabd"), (2L, "xy"), (3L, "zzzz")).toDF("doc_id", "text")
    val got = graft.operators.TextAnalysis.winnowFrame(docs, "doc_id", "text", k, w)
      .orderBy("doc_id").as[(Long, Long, String, String)].collect().toSeq
    def reference(text: String): Option[(Long, String, String)] = {
      val hashes = text.sliding(k).toSeq.map(md5hex)
      if (hashes.length < w) None
      else {
        val mins = hashes.sliding(w).map(_.min).toSeq.distinct
        Some((mins.length.toLong, mins.min, mins.max))
      }
    }
    val expect = Seq(1L -> "abcabcabd", 3L -> "zzzz").flatMap { case (id, t) =>
      reference(t).map { case (n, lo, hi) => (id, n, lo, hi) }
    }
    // doc 2 is shorter than k + w - 1 → no full window → absent
    assert(got == expect)
  }

  test("winnow and char_shingles_all SQL registration with arity checks") {
    org.apache.spark.sql.graftbridge.registerFunctions(spark)
    val r = sql("""SELECT winnow('abcabcabd', 3, 2) AS w,
                  |       char_shingles_all('abab', 2) AS s""".stripMargin).head()
    // matches the Column-API kernel exactly
    val viaCol = Seq(Tuple1("abcabcabd")).toDF("t")
      .select(graft.functions.SetOps.winnowHashesCol($"t", 3, 2)).as[Seq[String]].head()
    assert(r.getSeq[String](0) == viaCol)
    assert(r.getSeq[String](1) == Seq("ab", "ba", "ab")) // positional: dups kept
    intercept[IllegalArgumentException] { sql("SELECT winnow('x', 3)").head() }
    intercept[IllegalArgumentException] { sql("SELECT char_shingles_all('x', n) FROM (SELECT 2 AS n)").collect() }
  }

  test("row-local simhash kernels are bit-identical to the explode-and-vote frames") {
    // the kernels replace the frames in the registry queries, so equality
    // must hold on awkward tokenizations too: multi-space (empty tokens),
    // unicode, single token, empty string
    val texts = Seq(
      (1L, "the quick brown fox the quick"),
      (2L, "a  b   c"), // empty tokens, kept by split(text, " ")
      (3L, "héllo wörld 🌍"),
      (4L, "solo"),
      (5L, ""))
    val docs = texts.toDF("id", "text").withColumn("_toks", split($"text", " "))
    val frame32 = Dedup.simhash32Frame(docs, "id", $"_toks").as[(Long, Long)].collect().toMap
    val kernel32 = docs.select($"id", graft.functions.SimHash.simhash32Md5Col($"text"))
      .as[(Long, Long)].collect().toMap
    assert(kernel32 == frame32)
    val frame64 = Dedup.simhash64Frame(docs, "id", $"_toks").as[(Long, Long)].collect().toMap
    val kernel64 = docs.select($"id", graft.functions.SimHash.simhash64Col($"text"))
      .as[(Long, Long)].collect().toMap
    assert(kernel64 == frame64)
  }

  test("row-local BLOB simhash kernels are bit-identical to the explode-and-vote hex-shingle frames") {
    // the r15 kernels replace the explode plans inside
    // Multimodal.blobSimhash32/64; equality must hold on binary content
    // incl. zero bytes, high bytes, exactly-n, shorter-than-n (dropped)
    val rows = Seq(
      (1L, Array[Byte](0, 1, 2, 3, 4, 5)),
      (2L, Array[Byte](-1, -128, 127, 0)),          // exactly n = 4
      (3L, "YUV4MPEG2 W4 H4\nFRAME\n".getBytes("UTF-8")),
      (4L, Array[Byte](9, 9)),                      // < n: no shingles, drops
      (5L, Array.tabulate[Byte](300)(i => (i * 37 % 251).toByte)))
    val blobs = rows.toDF("doc_id", "content")
      .withColumn("n_bytes", octet_length($"content").cast("long"))
    def explode32(n: Int) = {
      val withHex = blobs.select($"doc_id", $"n_bytes", hex($"content").as("_hex"))
      val grams = transform(
        sequence(lit(1L), greatest($"n_bytes" - (n - 1), lit(1L))),
        i => $"_hex".substr((i * 2 - 1).cast("int"), lit(2 * n)))
      val sh = when($"n_bytes" >= n, grams).otherwise(array().cast("array<string>"))
      (Dedup.simhash32Frame(withHex, "doc_id", sh).as[(Long, Long)].collect().toMap,
        Dedup.simhash64Frame(withHex, "doc_id", sh).as[(Long, Long)].collect().toMap)
    }
    for (n <- Seq(2, 4)) {
      val (f32, f64) = explode32(n)
      val k32 = graft.operators.Multimodal.blobSimhash32(blobs, "doc_id", n)
        .as[(Long, Long)].collect().toMap
      val k64 = graft.operators.Multimodal.blobSimhash64(blobs, "doc_id", n)
        .as[(Long, Long)].collect().toMap
      assert(k32 == f32, s"n=$n 32-bit")
      assert(k64 == f64, s"n=$n 64-bit")
      // shorter-than-n blobs drop in both plans (id 4 is 2 bytes)
      if (n == 4) assert(!k32.contains(4L))
    }
  }

  test("winnowHashesRoll equals an independent rolling-winnow reimplementation") {
    def fmix(x0: Long): Long = {
      var x = x0
      x ^= x >>> 33; x *= 0xFF51AFD7ED558CCDL
      x ^= x >>> 33; x *= 0xC4CEB9FE1A85EC53L
      x ^= x >>> 33
      x
    }
    val unsignedLt = (a: Long, b: Long) => java.lang.Long.compareUnsigned(a, b) < 0
    def ref(text: String, k: Int, w: Int): Seq[Long] = {
      val cps = text.codePoints().toArray
      if (cps.length < k + w - 1) return Seq.empty
      val vals = cps.map(cp =>
        new String(Character.toChars(cp)).getBytes("UTF-8")
          .foldLeft(0L)((v, b) => (v << 8) | (b & 0xFFL)))
      val B = 0x100000001B3L
      val bk = (1 until k).foldLeft(1L)((a, _) => a * B)
      val n = cps.length - k + 1
      val hs = new Array[Long](n)
      var h = 0L
      (0 until k).foreach(i => h = h * B + vals(i))
      hs(0) = fmix(h)
      (1 until n).foreach { i =>
        h = (h - vals(i - 1) * bk) * B + vals(i + k - 1)
        hs(i) = fmix(h)
      }
      (0 to n - w).map(s => (s until s + w).map(hs).reduce((a, b) => if (unsignedLt(b, a)) b else a))
        .distinct
    }
    val texts = Seq("abcabcabd", "zzzz", "héllo wörld ünïcode🌍 text", "xy",
      "the quick brown fox jumps over the lazy dog")
    texts.foreach { t =>
      val got = Seq(Tuple1(t)).toDF("t")
        .select(graft.functions.SetOps.winnowHashesRollCol($"t", 3, 2)).as[Seq[Long]].head()
      assert(got == ref(t, 3, 2), s"text=$t")
    }
  }

  test("both winnow families share a fingerprint across docs sharing a long substring") {
    // the winnowing guarantee (shared substring of length >= k + w - 1
    // => >= 1 shared fingerprint) must hold for the md5 oracle family AND
    // the rolling production family — k=5, w=4 needs >= 8 shared chars
    val shared = "commonsubstringxyz"
    val docs = Seq(("a", "AAAA" + shared + "BBBB"), ("b", "CCCCCC" + shared + "DDD")).toDF("id", "t")
    val md5Fps = docs.select($"id", graft.functions.SetOps.winnowHashesCol($"t", 5, 4).as("fp"))
      .as[(String, Seq[String])].collect().toMap
    assert(md5Fps("a").toSet.intersect(md5Fps("b").toSet).nonEmpty, "md5 family lost the guarantee")
    val rollFps = docs.select($"id", graft.functions.SetOps.winnowHashesRollCol($"t", 5, 4).as("fp"))
      .as[(String, Seq[Long])].collect().toMap
    assert(rollFps("a").toSet.intersect(rollFps("b").toSet).nonEmpty, "rolling family lost the guarantee")
    // and identical texts produce element-wise identical arrays (the
    // q_doc_winnow_roll oracle invariant)
    val dup = Seq(("x", "abcdefghij klmnop"), ("y", "abcdefghij klmnop")).toDF("id", "t")
      .select($"id", graft.functions.SetOps.winnowHashesRollCol($"t", 5, 4).as("fp"))
      .as[(String, Seq[Long])].collect().toMap
    assert(dup("x") == dup("y") && dup("x").nonEmpty)
  }

  test("winnow_roll SQL registration with arity checks") {
    org.apache.spark.sql.graftbridge.registerFunctions(spark)
    val viaSql = sql("SELECT winnow_roll('abcabcabd', 3, 2) AS w").head().getSeq[Long](0)
    val viaCol = Seq(Tuple1("abcabcabd")).toDF("t")
      .select(graft.functions.SetOps.winnowHashesRollCol($"t", 3, 2)).as[Seq[Long]].head()
    assert(viaSql == viaCol)
    intercept[IllegalArgumentException] { sql("SELECT winnow_roll('x', 3)").head() }
  }

  test("minhash estimator tracks exact jaccard (statistical property)") {
    // synthetic near-dup families with known overlap ratios
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(60)(s"w${rnd.nextInt(5000)}")
    def mutate(frac: Double) =
      base.map(w => if (rnd.nextDouble() < frac) s"m${rnd.nextInt(5000)}" else w).mkString(" ")
    val docs = (0 until 6).map(i => (i.toLong, mutate(i * 0.15))).toDF("id", "text")
      .withColumn("_toks", split($"text", " "))
    val sh = docs.select($"id", Dedup.tokenShingles($"_toks", 3).as("sh"))
    val sig = Dedup.minhashSignatures(docs, "id", Dedup.tokenShingles($"_toks", 3), 128)
    val pairs = sh.select($"id".as("ia"), $"sh".as("sa"))
      .crossJoin(sh.select($"id".as("ib"), $"sh".as("sb"))).filter($"ia" < $"ib")
      .join(sig.select($"id".as("ia"), $"sig".as("ga")), "ia")
      .join(sig.select($"id".as("ib"), $"sig".as("gb")), "ib")
      .select(
        Dedup.jaccardPpm($"sa", $"sb").as("exact"),
        Dedup.minhashEstimatePpm($"ga", $"gb").as("est"))
      .as[(Long, Long)].collect()
    // k=128 ⇒ se ≈ sqrt(j(1-j)/128) ≤ 0.044; allow 4σ
    pairs.foreach { case (exact, est) =>
      assert(math.abs(exact - est) < 180000, s"exact=$exact est=$est")
    }
  }

  test("expressions registered as SQL functions work from spark.sql") {
    import org.apache.spark.sql.graftbridge
    graftbridge.registerFunctions(spark)
    val r = sql("""SELECT szudzik_unpair(szudzik_pair(7L, 9L)) AS p,
                  |       cantor_unpair(cantor_pair(3L, 4L)) AS c,
                  |       jaccard_ppm(array('a','b'), array('b','c')) AS j""".stripMargin).head()
    assert(r.getStruct(0).getLong(0) == 7L && r.getStruct(0).getLong(1) == 9L)
    assert(r.getStruct(1).getLong(0) == 3L && r.getStruct(1).getLong(1) == 4L)
    assert(r.getLong(2) == 1000000L / 3L)
  }

  test("connectedComponents: chain, triangle, isolated pair, transitivity") {
    // chain 1-2-3-4 (1≈4 never directly paired), triangle 10-11-12, pair 20-21
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L), (11L, 12L),
      (10L, 12L), (20L, 21L)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(pairs).as[(Long, Long)].collect().toMap
    assert(comp == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 12L -> 10L, 20L -> 20L, 21L -> 20L))
  }

  test("connectedComponents converges on a diameter-80 chain (pointer jumping)") {
    // plain neighbor-min needs O(diameter) = 80 rounds — past the default
    // maxIter 50; the pointer jump must close it in O(log 80) ≈ 7
    val chain = (0L until 80L).map(i => (i, i + 1)).toDF("id_a", "id_b")
    val comp = Dedup.connectedComponents(chain).as[(Long, Long)].collect().toMap
    assert(comp.size == 81 && comp.values.forall(_ == 0L), comp.toString)
  }

  test("candidatePairs skew guard drops oversized buckets") {
    // 5 identical docs → every band bucket has 5 ids → maxBucket=4 kills all
    val many = (0 until 5).map(i => (i.toLong, "x y z w v u t s r q")).toDF("id", "text")
      .withColumn("_toks", split($"text", " "))
    val sig = Dedup.minhashSignatures(many, "id", Dedup.tokenShingles($"_toks", 3), 16)
    val capped = Dedup.candidatePairs(sig, "id", Dedup.lshBandKeys($"sig", 4, 4), maxBucket = 4)
    assert(capped.count() == 0)
  }

  test("simhashNearDupPairs: exact recall within the pigeonhole radius") {
    // 4 blocks of 8 bits: any pair within hamming ≤ 3 must leave one
    // block untouched and therefore MUST be found; a 4-bit spread (one
    // flip per block) is beyond the radius and correctly absent
    val base = 0x12345678L
    val fps = Seq(
      (1L, base),
      (2L, base ^ 0x3L),        // 2 flips, same block
      (3L, base ^ 0x01010100L), // 3 flips across 3 blocks, block 0 shared
      (4L, base ^ 0x01010101L), // 4 flips, one per block → beyond radius
      (5L, 0x0FED0BA9L)         // distant
    ).toDF("id", "fp")
    val pairs = Dedup.simhashNearDupPairs(fps, "id", "fp",
        nbits = 32, blocks = 4, maxHamming = 3)
      .as[(Long, Long, Long)].collect().toSet
    // (3,4) differ only in bit 0 → hamming 1, also found; (2,3), (2,4)
    // and everything involving 5 are beyond the radius
    assert(pairs == Set((1L, 2L, 2L), (1L, 3L, 3L), (3L, 4L, 1L)))
  }

  test("simhashNearDupPairs at 64 bits equals brute-force all-pairs (6 blocks, radius 5)") {
    // differential test for the production config: the blocked pipeline's
    // pair set must equal all-pairs bit_count filtering — including pairs
    // whose differing bits land in the 4 bits the 6×10-bit blocks leave
    // uncovered (id 6: flips in bits 60-63 only)
    val base = 0x123456789ABCDEFL
    val fpRows = Seq(
      (1L, base),
      (2L, base ^ 0x1FL),                 // 5 flips, one block
      (3L, base ^ 0x8421084210L),         // 5 flips spread across 5 blocks
      (4L, base ^ 0x0041041041041041L),   // beyond radius (> 5 flips)
      (5L, -base),                        // distant
      (6L, base ^ 0xF000000000000000L)    // 4 flips, all in uncovered bits
    )
    val pairs = Dedup.simhashNearDupPairs(fpRows.toDF("id", "fp"), "id", "fp",
        nbits = 64, blocks = 6, maxHamming = 5)
      .as[(Long, Long, Long)].collect().toSet
    val brute = (for {
      (ia, fa) <- fpRows; (ib, fb) <- fpRows
      if ia < ib && java.lang.Long.bitCount(fa ^ fb) <= 5
    } yield (ia, ib, java.lang.Long.bitCount(fa ^ fb).toLong)).toSet
    assert(pairs == brute)
    assert(pairs.contains((1L, 6L, 4L)), "uncovered-bit pair must still be recalled")
  }

  test("near-dup pipeline feeds from staged parquet scans, not executor-resident blocks") {
    // VERDICT r4 What's-wrong #2: the multi-branch fingerprint frame must
    // reach its consumers as a FileScan over the staging store — a
    // localCheckpoint RDD scan would vanish with a lost executor
    val fps = Seq((1L, 1L), (2L, 3L)).toDF("id", "fp")
    val plan = Dedup.simhashNearDupPairs(fps, "id", "fp",
      nbits = 32, blocks = 4, maxHamming = 3).queryExecution.executedPlan.toString
    assert(plan.contains("_staging"), s"no staged file scan in plan:\n$plan")
    assert(!plan.toLowerCase.contains("checkpoint"), "plan still reads checkpointed RDD blocks")
  }

  test("simhashNearDupPairs rejects a radius the block count cannot cover") {
    val fps = Seq((1L, 0L)).toDF("id", "fp")
    intercept[IllegalArgumentException] {
      Dedup.simhashNearDupPairs(fps, "id", "fp", nbits = 32, blocks = 4, maxHamming = 4)
    }
  }

  test("contaminationFlags flags a planted eval duplicate, exact recall, df cap") {
    val eval = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"), // exact dup of eval 1
      (11L, "zzzzz yyyyy xxxxx wwwww vvvvv uuuuu ttttt")    // zero shingle overlap
    ).toDF("id", "text")
    val r = Dedup.contaminationFlags(corpus, eval, "id", "text", 5, 500000L)
      .as[(Long, Long, Long, Int)].collect().toSeq
    // doc 11 shares no shingle → absent; doc 10 is identical → jac 1e6
    assert(r == Seq((10L, 1L, 1000000L, 1)))
    // df cap: at maxDf = 1 every shared shingle (df = 2) is dropped, so
    // even the exact dup loses its candidates — the valve really prunes
    val capped = Dedup.contaminationFlags(corpus, eval, "id", "text", 5, 500000L, maxDf = 1)
      .collect()
    assert(capped.isEmpty)
  }

  test("bloom-prefiltered contamination equals unfiltered; probe is in the plan") {
    val eval = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "pack my box with five dozen liquor jugs")).toDF("id", "text")
    val corpus = Seq(
      (10L, "the quick brown fox jumps over the lazy dog"),
      (11L, "pack my box with five dozen liquor jugs today"),
      (12L, "completely unrelated words zebra quartz mythic")).toDF("id", "text")
    val plain = Dedup.contaminationFlags(corpus, eval, "id", "text", 5, 500000L)
      .as[(Long, Long, Long, Int)].collect().toSet
    val df = Dedup.contaminationFlags(corpus, eval, "id", "text", 5, 500000L,
      bloomFpp = Some(0.01))
    assert(df.as[(Long, Long, Long, Int)].collect().toSet == plain)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"), s"no bloom probe in plan:\n$plan")
  }

  test("contamination plan reads the staged hot set, not a re-inlined dfCount") {
    val eval = Seq((1L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val corpus = Seq((10L, "the quick brown fox jumps over the lazy dog")).toDF("id", "text")
    val plan = Dedup.contaminationFlags(corpus, eval, "id", "text", 5, 500000L,
      bloomFpp = Some(0.01)).queryExecution.executedPlan.toString
    assert(plan.contains("decon_hot_shingles"), s"hot set not staged:\n${plan.take(2000)}")
    // the df-count aggregation must appear at most once in the plan —
    // its duplication per broadcast(hot) consumer was the 3× shuffle
    // defect the bench instrumentation caught
    val dfCounts = "count\\(distinct _d".r.findAllIn(plan.toLowerCase).size
    assert(dfCounts <= 2, s"dfCount inlined $dfCounts times (partial+final = 2 max):\n${plan.take(2000)}")
  }

  test("bloomMightContain: no false negatives, few false positives") {
    val build = (0L until 1000L).toDF("h")
    val probe = Dedup.bloomMightContain(build, "h", 0.01) _
    val r = (0L until 4000L).toDF("x")
      .select($"x", probe(col("x")).as("hit")).as[(Long, Boolean)].collect()
    val (in, out) = r.partition(_._1 < 1000L)
    assert(in.forall(_._2), "bloom false negative")
    val fps = out.count(_._2)
    assert(fps <= 100, s"bloom fp rate too high: $fps/3000")
  }

  test("candidatePairsAcross: batch probes index only — no batch-internal pairs") {
    val mk = (id: Long, text: String) =>
      (id, text)
    // index docs 1, 2; batch docs 11 (dup of 1), 12 (dup of 11 — batch-internal), 13 (unique)
    val common = (1 to 30).map(i => s"tok$i").mkString(" ")
    val docs = Seq(
      mk(1L, common), mk(2L, (31 to 60).map(i => s"z$i").mkString(" ")),
      mk(11L, common), mk(12L, common), mk(13L, (61 to 90).map(i => s"q$i").mkString(" "))
    ).toDF("doc_id", "text").withColumn("_toks", split($"text", " "))
    val index = docs.filter($"doc_id" < 10L)
    val batch = docs.filter($"doc_id" >= 10L)
    def sig(df: org.apache.spark.sql.DataFrame) =
      graft.operators.Dedup.minhashSignatures(df, "doc_id",
        graft.operators.Dedup.tokenShingles($"_toks", 3), 64)
    val pairs = graft.operators.Dedup.candidatePairsAcross(
        sig(index), graft.operators.Dedup.lshBandKeys($"sig", 16, 4),
        sig(batch), graft.operators.Dedup.lshBandKeys($"sig", 16, 4), "doc_id")
      .as[(Long, Long)].collect().toSet
    // both batch dups hit the index doc; the batch-internal pair (11, 12)
    // and the unique docs never surface
    assert(pairs == Set((11L, 1L), (12L, 1L)), s"got $pairs")
  }

  test("blob dedup: byte-shingle simhash surfaces planted exact + near dups") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val blobs = graft.operators.Multimodal.toBlobTable(
      Seq(
        (0L, base),                       // original
        (1L, base),                       // exact byte dup of 0
        (2L, base.replace("tok7", "tok9")), // near dup: few bytes differ
        (3L, (100 to 140).map(i => s"zz$i").mkString(" ")) // unrelated
      ).toDF("doc_id", "text"),
      "doc_id", "text", "text")
    val fps = graft.operators.Multimodal.blobSimhash32(blobs, "doc_id", n = 4)
    // exact dup ⇒ identical fingerprint (deterministic projection)
    val fpMap = fps.as[(Long, Long)].collect().toMap
    assert(fpMap(0L) == fpMap(1L), "exact byte dup must share the fingerprint")
    val pairs = Dedup.simhashNearDupPairs(fps, "doc_id", "fp",
        nbits = 32, blocks = 4, maxHamming = 3)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)), "exact dup pair missing")
    assert(pairs.contains((0L, 2L)) && pairs.contains((1L, 2L)),
      s"planted near-dup pair missing: $pairs")
    assert(!pairs.exists { case (a, b) => a == 3L || b == 3L },
      s"unrelated blob paired: $pairs")
  }

  test("blob64: planted dups surface; pairs equal brute-force within radius") {
    val base = (1 to 60).map(i => s"tok$i").mkString(" ")
    val blobs = graft.operators.Multimodal.toBlobTable(
      Seq(
        (0L, base),
        (1L, base),                           // exact byte dup of 0
        (2L, base.replace("tok9", "tok7")),   // near dup
        (3L, (200 to 260).map(i => s"qq$i").mkString(" "))
      ).toDF("doc_id", "text"),
      "doc_id", "text", "text")
    val fps = graft.operators.Multimodal.blobSimhash64(blobs, "doc_id", n = 4)
    val fpMap = fps.as[(Long, Long)].collect().toMap
    assert(fpMap(0L) == fpMap(1L), "identical bytes must share the 64-bit fp")
    val pairs = Dedup.simhashNearDupPairs(fps, "doc_id", "fp",
        nbits = 64, blocks = 6, maxHamming = 5)
      .select($"id_a", $"id_b", $"hamming").as[(Long, Long, Long)].collect()
      .map(p => (p._1, p._2) -> p._3).toMap
    // brute force over the same fingerprints: exact recall at hamming ≤ 5
    // is the 6-block pigeonhole guarantee
    val ids = fpMap.keys.toSeq.sorted
    val brute = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(fpMap(a) ^ fpMap(b)) if h <= 5
    } yield (a, b) -> h.toLong).toMap
    assert(pairs == brute, s"blocked=$pairs brute=$brute")
    assert(pairs.contains((0L, 1L)) && pairs((0L, 1L)) == 0L)
  }

  test("blobSimhash32: sub-n blobs drop out; hex shingles are byte-aligned") {
    val blobs = graft.operators.Multimodal.toBlobTable(
      Seq((1L, "abc"), (2L, "abcd")).toDF("doc_id", "text"),
      "doc_id", "text", "text")
    val fps = graft.operators.Multimodal.blobSimhash32(blobs, "doc_id", n = 4)
      .as[(Long, Long)].collect().toMap
    assert(!fps.contains(1L), "3-byte blob has no 4-byte shingle")
    // "abcd" has exactly one 4-byte shingle: md5("61626364")'s nibble
    // votes give ±1 per bit — fp = the high-nibble mask of that md5
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("61626364".getBytes("UTF-8")).map(b => f"$b%02x").mkString
    val expected = h.take(32).zipWithIndex.foldLeft(0L) { case (acc, (c, _)) =>
      (acc << 1) | (if (Character.digit(c, 16) >= 8) 1L else 0L)
    }
    assert(fps(2L) == expected, f"fp=${fps(2L)}%08x expected=$expected%08x")
  }

  test("ppjoinPairs: exact recall — blocked output equals brute-force all-pairs") {
    import org.apache.spark.sql.functions._
    // dup-dense fixture: near-dups, exact dups, and unrelated docs with
    // overlapping vocabulary (the prefix filter must not lose any pair)
    val base = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, base),
      (2L, base),                                  // exact dup
      (3L, base.replace("w7", "w99")),             // near dup of 1/2
      (4L, (1 to 30).map(i => s"w${i + 15}").mkString(" ")), // ~half overlap
      (5L, (100 to 130).map(i => s"w$i").mkString(" "))      // unrelated
    ).toDF("doc_id", "text").withColumn("_toks", split(col("text"), " "))
    val sh = Dedup.tokenShingles(col("_toks"), 3)
    val blocked = Dedup.ppjoinPairs(docs, "doc_id", sh, minJacPpm = 500000L)
      .as[(Long, Long, Long)].collect().toSet
    // brute force over the same shingle sets
    val sets = docs.select(col("doc_id"), array_sort(array_distinct(sh)).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val brute = (for {
      a <- sets.keys.toSeq; b <- sets.keys.toSeq if a < b
      inter = sets(a).toSet.intersect(sets(b).toSet).size.toLong
      union = sets(a).toSet.union(sets(b).toSet).size.toLong
      jac = math.floor(inter * 1000000.0 / union).toLong if jac >= 500000L
    } yield (a, b, jac)).toSet
    assert(blocked == brute, s"blocked=$blocked brute=$brute")
    assert(blocked.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1000000L))
  }

  test("fuzzyPairsEd1: every edit class found; equals brute-force levenshtein") {
    // one planted pair per edit class, plus traps: transposition (dist 2,
    // shares deletion variants — must be cut by the verify), distance-2
    // substitution, and an unrelated word
    val words = Seq("spark", "spbrk" /* substitution */ , "sparks" /* insertion */ ,
      "spak" /* deletion */ , "sprak" /* transposition = dist 2 */ ,
      "flink", "plonk", "spark" /* dup string: distinct() must collapse */)
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val got = Dedup.fuzzyPairsEd1(words, "w")
      .as[(String, String, Long)].collect().toSet
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    val vocab = words.as[(Long, String)].collect().map(_._2).distinct
    val brute = (for {
      a <- vocab; b <- vocab if a < b && lev(a, b) <= 1
    } yield (a, b, lev(a, b).toLong)).toSet
    assert(got == brute, s"got=$got brute=$brute")
    assert(got.contains(("spark", "spbrk", 1L)))
    assert(got.contains(("spark", "sparks", 1L)))
    assert(got.contains(("spak", "spark", 1L)))
    assert(!got.exists(p => p._1 == "sprak" && p._2 == "spark"))

    // randomized differential on a dense small-alphabet vocabulary
    // (maximizes shared variants and distance-2 traps)
    val rnd = new scala.util.Random(7)
    val dense = Seq.fill(120)((3 + rnd.nextInt(4), rnd)).map { case (len, r) =>
      (1 to len).map(_ => ('a' + r.nextInt(3)).toChar).mkString
    }.distinct.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val got2 = Dedup.fuzzyPairsEd1(dense.toDF("id", "w"), "w")
      .as[(String, String, Long)].collect().toSet
    val vocab2 = dense.map(_._2)
    val brute2 = (for {
      a <- vocab2; b <- vocab2 if a < b && lev(a, b) <= 1
    } yield (a, b, lev(a, b).toLong)).toSet
    assert(got2 == brute2,
      s"missing=${(brute2 diff got2).take(3)} extra=${(got2 diff brute2).take(3)}")

    // maxBucket valve drops hot variant buckets (documented recall hit)
    val hot = (0 until 12).map(i => (i.toLong, s"x$i")).toDF("id", "w")
    // all "x<d>" share deletion variant "x": bucket size 12 > cap 8
    val capped = Dedup.fuzzyPairsEd1(hot, "w", maxBucket = Some(8L))
      .as[(String, String, Long)].collect().toSet
    // the digit-substitution pairs (x0..x9 pairwise) lived ONLY in the
    // dropped "x" bucket and vanish; the insertion-class pairs (x1↔x10,
    // x1↔x11, x0↔x10, x10↔x11) share small per-name buckets and survive
    assert(capped == Set(("x0", "x10", 1L), ("x1", "x10", 1L),
      ("x1", "x11", 1L), ("x10", "x11", 1L)))
    val uncapped = Dedup.fuzzyPairsEd1(hot, "w")
      .as[(String, String, Long)].collect().toSet
    val vocab3 = (0 until 12).map(i => s"x$i")
    val brute3 = (for {
      a <- vocab3; b <- vocab3 if a < b && lev(a, b) <= 1
    } yield (a, b, lev(a, b).toLong)).toSet
    assert(uncapped == brute3)
  }

  test("fuzzyPairsEd2: exact recall for every distance-2 edit class") {
    def lev(a: String, b: String): Int = {
      val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
        if (i == 0) j else if (j == 0) i else 0 }
      for (i <- 1 to a.length; j <- 1 to b.length)
        d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
          d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
      d(a.length)(b.length)
    }
    // distance-2 classes ed1 misses: transposition, double substitution,
    // double insertion/deletion, substitution+insertion; plus a
    // distance-3 trap that must be cut by the verify
    val words = Seq("spark", "sprak" /* transposition: 2 */ ,
      "sbcrk" /* double substitution: 2 */ , "spa" /* double deletion: 2 */ ,
      "sparkle" /* double insertion: 2 */ , "qparks" /* sub+ins: 2 */ ,
      "flink" /* far */ , "ab", "b" /* short strings: guard path */)
      .zipWithIndex.map { case (w, i) => (i.toLong, w) }.toDF("id", "w")
    val got = Dedup.fuzzyPairsEd2(words, "w")
      .as[(String, String, Long)].collect().toSet
    val vocab = Seq("spark", "sprak", "sbcrk", "spa", "sparkle", "qparks",
      "flink", "ab", "b")
    val brute = (for {
      a <- vocab; b <- vocab if a < b && lev(a, b) <= 2
    } yield (a, b, lev(a, b).toLong)).toSet
    assert(got == brute, s"missing=${(brute diff got).take(5)} extra=${(got diff brute).take(5)}")
    assert(got.contains(("spark", "sprak", 2L)))
    assert(got.contains(("spa", "spark", 2L)))
    assert(got.contains(("spark", "sparkle", 2L)))

    // randomized dense-alphabet differential (the adversarial corpus:
    // tiny alphabet maximizes shared variants and distance-3 traps)
    val rnd = new scala.util.Random(13)
    val dense = Seq.fill(90)((2 + rnd.nextInt(5), rnd)).map { case (len, r) =>
      (1 to len).map(_ => ('a' + r.nextInt(3)).toChar).mkString
    }.distinct.zipWithIndex.map { case (w, i) => (i.toLong, w) }
    val got2 = Dedup.fuzzyPairsEd2(dense.toDF("id", "w"), "w")
      .as[(String, String, Long)].collect().toSet
    val vocab2 = dense.map(_._2)
    val brute2 = (for {
      a <- vocab2; b <- vocab2 if a < b && lev(a, b) <= 2
    } yield (a, b, lev(a, b).toLong)).toSet
    assert(got2 == brute2,
      s"missing=${(brute2 diff got2).take(3)} extra=${(got2 diff brute2).take(3)}")
  }

  test("hammingBlockedPairs: blocked output equals brute force, incl. constant runs") {
    import org.apache.spark.sql.functions._
    // keys with a constant prefix run (the degenerate case for contiguous
    // blocking) and mismatches spread across positions
    val recs = Seq(
      (1L, "ID-000123"), (2L, "ID-000124"),  // hamming 1
      (3L, "ID-000153"), (4L, "ID-900123"),  // 3↔1: 2, 4↔1: 1
      (5L, "ID-975421"), (6L, "XY-000123"))  // 6↔1: 2 (prefix typo)
      .toDF("id", "key")
    val got = Dedup.hammingBlockedPairs(recs, "id", col("key"), width = 9, maxMismatch = 2)
      .as[(Long, Long, Long)].collect().toSet
    val keys = recs.as[(Long, String)].collect().toMap
    val brute = (for {
      a <- keys.keys.toSeq; b <- keys.keys.toSeq if a < b
      h = keys(a).zip(keys(b)).count { case (x, y) => x != y }.toLong if h <= 2
    } yield (a, b, h)).toSet
    assert(got == brute, s"got=$got brute=$brute")
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 6L, 2L)))
  }

  test("sortedNeighborPairs: banded ranks equal one global sort window") {
    import org.apache.spark.sql.functions._
    // keys sort across two bands (prefix 'A'/'B'); neighbors within 3
    val recs = (0 until 40).map { i =>
      val band = if (i < 20) "A" else "B"
      (i.toLong, f"$band${(i * 13) % 97}%03d")
    }.toDF("id", "key")
    val got = Dedup.sortedNeighborPairs(recs, "id", col("key"),
        substring(col("key"), 1, 1), width = 4, w = 3, maxMismatch = 3)
      .as[(Long, Long, Long)].collect().toSet
    val sorted = recs.as[(Long, String)].collect().toSeq.sortBy(t => (t._2, t._1))
    val expect = (for {
      i <- sorted.indices; d <- 1 to 3 if i + d < sorted.size
      (ia, ka) = sorted(i); (ib, kb) = sorted(i + d)
      h = ka.zip(kb).count { case (x, y) => x != y }.toLong if h <= 3
    } yield (ia, ib, h)).toSet
    assert(got == expect, s"got=${got.size} expect=${expect.size}")
  }

  test("containmentPairs: small-in-big quote found (Jaccard-LSH's blind spot), prefix ≡ brute force") {
    import graft.operators.{Dedup, TextAnalysis}
    // doc 100 = a long host; doc 101 = a 6-token quote pasted from it
    // (all its shingles contained); doc 102 shares nothing; doc 103 is a
    // half-overlap probe under the 0.8 threshold
    val host = (1 to 40).map(i => s"w$i").mkString(" ")
    val corpus = Seq(
      (100L, host),
      (101L, (5 to 10).map(i => s"w$i").mkString(" ")),
      (102L, "x1 x2 x3 x4 x5 x6 x7"),
      (103L, "w1 w2 w3 q1 q2 q3 q4 q5")).toDF("doc_id", "text")
      .withColumn("_toks", split($"text", " "))
    def shOf(t: String) = t.split(" ").sliding(3).map(_.mkString(" ")).toSet
    val byId = Map(100L -> shOf(host), 101L -> shOf("w5 w6 w7 w8 w9 w10"),
      102L -> shOf("x1 x2 x3 x4 x5 x6 x7"), 103L -> shOf("w1 w2 w3 q1 q2 q3 q4 q5"))
    val brute = (for {
      (ia, sa) <- byId.toSeq; (ib, sb) <- byId.toSeq if ia != ib && sa.nonEmpty
      ppm = sa.intersect(sb).size.toLong * 1000000L / sa.size if ppm >= 800000L
    } yield (ia, ib, ppm)).toSet
    val rows = Dedup.containmentPairs(corpus, corpus, "doc_id",
        Dedup.tokenShingles(col("_toks"), 3), minContainPpm = 800000L)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.forall(_._4 == 0L), "sane corpus must not trip the df cap")
    val got = rows.map(r => (r._1, r._2, r._3)).toSet
    assert(got == brute, s"got=$got brute=$brute")
    assert(got.exists(p => p._1 == 101L && p._2 == 100L)) // the planted quote
    assert(!got.exists(_._1 == 103L))  // under-threshold probe stays out
    // Jaccard of the planted pair is tiny — the whole point
    val j = byId(101L).intersect(byId(100L)).size * 1000000L /
      byId(101L).union(byId(100L)).size
    assert(j < 200000L)
  }

  test("containmentPairs ≡ brute force on a deterministic random corpus (prefix boundary sweep)") {
    import graft.operators.Dedup
    // 40 docs over an 8-word vocab: dense shingle collisions, lengths
    // 3..20 tokens — exercises k_A = |A| − ⌈t|A|⌉ + 1 at many |A|
    val rnd = new scala.util.Random(42)
    val texts = (0L until 40L).map { i =>
      val n = 3 + rnd.nextInt(18)
      i -> (0 until n).map(_ => s"v${rnd.nextInt(8)}").mkString(" ")
    }
    val corpus = texts.toDF("doc_id", "text").withColumn("_toks", split($"text", " "))
    for (tPpm <- Seq(500000L, 700000L, 900000L, 1000000L)) {
      val got = Dedup.containmentPairs(corpus, corpus, "doc_id",
          Dedup.tokenShingles(col("_toks"), 3), minContainPpm = tPpm)
        .select($"contained_id", $"container_id", $"contain_ppm")
        .as[(Long, Long, Long)].collect().toSet
      val sh = texts.map { case (i, t) =>
        i -> t.split(" ").sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSet
      }.toMap
      val brute = (for {
        (ia, sa) <- sh.toSeq; (ib, sb) <- sh.toSeq
        if ia != ib && sa.nonEmpty
        ppm = sa.intersect(sb).size.toLong * 1000000L / sa.size if ppm >= tPpm
      } yield (ia, ib, ppm)).toSet
      assert(got == brute, s"t=$tPpm: got=${got.size} brute=${brute.size} " +
        s"missing=${(brute diff got).take(3)} extra=${(got diff brute).take(3)}")
    }
  }

  test("containmentPairs df cap: degenerate all-ubiquitous probe bounded, sane probes exact, trade flagged") {
    import graft.operators.Dedup
    // 700 fillers with unique shingles + a twin doc; EVERY corpus doc
    // ends with the same 4 tokens, making two corpus-wide ubiquitous
    // shingles (df = 701). n ≈ 2103 distinct shingles → p99.9 rank
    // lands inside the df=1 mass → cap = 1 → the ubiquitous shingles
    // are over-cap in any prefix.
    val fillers = (0L until 700L).map(i =>
      (i, s"f${i}a f${i}b f${i}c ZZZ YYY XXX WWW"))
    val corpus = (fillers :+ ((9000L, "q1 ZZZ YYY XXX WWW")))
      .toDF("doc_id", "text").withColumn("_toks", split($"text", " "))
    val probes = Seq(
      (9991L, "ZZZ YYY XXX WWW"),          // ONLY ubiquitous shingles
      (9992L, "q1 ZZZ YYY XXX WWW"),       // 1 rare + 2 ubiquitous, k_A=2
      (9993L, "f7a f7b f7c ZZZ YYY XXX WWW")) // filler-7 twin: rare-rich
      .toDF("doc_id", "text").withColumn("_toks", split($"text", " "))
    def run(auto: Boolean) = Dedup.containmentPairs(corpus, probes, "doc_id",
        Dedup.tokenShingles(col("_toks"), 3), minContainPpm = 600000L,
        autoCap = auto)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val capped = run(auto = true)
    // degenerate probe: its whole prefix is over-cap → BOUNDED (no
    // fan-out to the 701 containers the uncapped path visits)
    assert(!capped.exists(_._1 == 9991L), capped.filter(_._1 == 9991L).toString)
    // flagged probe: the rare shingle still finds the twin, and every
    // emitted pair carries prefix_capped = 1 (recall not guaranteed —
    // the 700 filler pairs at 666666 ppm are the documented loss)
    val p2 = capped.filter(_._1 == 9992L)
    assert(p2 == Seq((9992L, 9000L, 1000000L, 1L)), p2.toString)
    // rare-rich probe: prefix never touches the cap → exact + unflagged
    val p3 = capped.filter(_._1 == 9993L)
    assert(p3 == Seq((9993L, 7L, 1000000L, 0L)), p3.toString)
    // uncapped twin run: exact recall everywhere (the degenerate probe
    // fans out to all 701 containers), zero flags
    val exact = run(auto = false)
    assert(exact.count(_._1 == 9991L) == 701, exact.count(_._1 == 9991L).toString)
    assert(exact.count(_._1 == 9992L) == 701) // twin at 1e6 + 700 at 666666
    assert(exact.forall(_._4 == 0L))
  }

  test("incrementalComponents == from-scratch CC (bridge, new nodes, no-op merges)") {
    // base: comps {1,2,3}, {10,11}, {20,21}; batch bridges {1..3}+{10,11}
    // via (3,10), adds new node 30 to {20,21} via (21,30), adds an
    // internal no-op edge (1,3), and a brand-new pair (40,41)
    val basePairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L)).toDF("id_a", "id_b")
    val batchPairs = Seq((3L, 10L), (21L, 30L), (1L, 3L), (40L, 41L)).toDF("id_a", "id_b")
    val base = Dedup.connectedComponents(basePairs)
    val inc = Dedup.incrementalComponents(base, batchPairs)
      .as[(Long, Long)].collect().toMap
    val full = Dedup.connectedComponents(basePairs.unionByName(batchPairs))
      .as[(Long, Long)].collect().toMap
    assert(inc == full, s"inc=$inc full=$full")
    assert(inc(11L) == 1L && inc(30L) == 20L && inc(41L) == 40L, inc.toString)
  }

  test("incrementalComponents == full CC on a random edge split") {
    val all = (1L to 120L).map { i =>
      val a = (i * 7919L) % 60L; val b = (i * 104729L) % 60L
      (math.min(a, b), math.max(a, b))
    }.filter(p => p._1 != p._2).distinct
    val (basePs, batchPs) = all.splitAt(all.size * 2 / 3)
    val base = Dedup.connectedComponents(basePs.toDF("id_a", "id_b"))
    val inc = Dedup.incrementalComponents(base, batchPs.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    val full = Dedup.connectedComponents(all.toDF("id_a", "id_b"))
      .as[(Long, Long)].collect().toMap
    assert(inc == full, s"diff=${(inc.toSet diff full.toSet).take(5)}")
  }

  test("cluster-atomic split: no component ever straddles two splits") {
    import graft.operators.Sampling
    // chain cluster {1,2,3}, pair {10,11}, singletons 20..40
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs)
      .withColumnRenamed("id", "doc_id").withColumnRenamed("comp", "component")
    val docs = (Seq(1L, 2L, 3L, 10L, 11L) ++ (20L to 40L)).toDF("doc_id")
    val split = docs.join(cc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("rep"),
        Sampling.hashSplit(coalesce(col("component"), col("doc_id")), 12, 14).as("split"))
      .as[(Long, Long, String)].collect()
    val byRep = split.groupBy(_._2)
    // every component is split-atomic
    assert(byRep.forall(_._2.map(_._3).distinct.size == 1), byRep.toString)
    // clustered docs share the min-id rep; singletons rep themselves
    assert(split.filter(r => Seq(1L, 2L, 3L).contains(r._1)).forall(_._2 == 1L))
    assert(split.filter(_._1 >= 20L).forall(r => r._2 == r._1))
    // and the singleton assignment equals the plain per-doc hashSplit
    val plain = docs.select(col("doc_id"),
        Sampling.hashSplit(col("doc_id"), 12, 14).as("s"))
      .as[(Long, String)].collect().toMap
    assert(split.filter(_._1 >= 20L).forall(r => r._3 == plain(r._1)))
  }

  test("blockingQuality: hand-counted metrics, pair-order canonicalization, empty truth") {
    // 5 records → P = 10 brute pairs; candidates: 3 distinct pairs, one
    // emitted in SWAPPED order + one duplicate (canonicalization must
    // dedupe both); truth: 2 pairs, 1 caught
    val recs = (1L to 5L).toDF("id")
    val cand = Seq((1L, 2L), (3L, 2L), (2L, 3L), (4L, 5L)).toDF("id_a", "id_b")
    val truth = Seq((2L, 3L), (1L, 5L)).toDF("id_a", "id_b")
    val got = graft.operators.Dedup.blockingQuality(cand, truth, recs)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    // reduction = (10-3)/10 = 700000 ppm; completeness = 1/2 = 500000
    assert(got == ((5L, 3L, 2L, 1L, 700000L, Some(500000L))), got.toString)
    // no true matches → completeness NULL, reduction still defined
    val empty = Seq.empty[(Long, Long)].toDF("id_a", "id_b")
    val g2 = graft.operators.Dedup.blockingQuality(cand, empty, recs)
      .as[(Long, Long, Long, Long, Long, Option[Long])].collect().head
    assert(g2 == ((5L, 3L, 0L, 0L, 700000L, None)), g2.toString)
  }

  test("lshTuning: brute banding replay exact; finer bands nest coarser candidates") {
    import graft.operators.{Dedup, TextAnalysis}
    import org.apache.spark.sql.functions._
    // near-dup pair (1,2), exact dup pair (3,4), singletons 5,6
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog today"),
      (2L, "the quick brown fox jumps over the lazy dog tonight"),
      (3L, "completely different text about spark catalyst planning"),
      (4L, "completely different text about spark catalyst planning"),
      (5L, "a unique document with its own words entirely"),
      (6L, "another standalone piece of text nothing shared"))
      .toDF("doc_id", "text")
      .withColumn("_toks", TextAnalysis.tokens(col("text")))
    val configs = Seq((8, 2), (4, 4), (2, 8))
    val got = Dedup.lshTuning(docs, "doc_id",
        Dedup.tokenShingles(col("_toks"), 3), k = 16, configs, thresholdPpm = 600000L)
      .orderBy(col("bands").desc)
      .as[(Long, Long, Long, Long, Option[Long])].collect().toSeq
    // brute replay: md5-string minhash -> slice band keys -> pairs -> verify
    def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map(b => f"${b & 0xFF}%02x").mkString
    val sh = docs.select(col("doc_id"), Dedup.tokenShingles(col("_toks"), 3).as("s"))
      .as[(Long, Seq[String])].collect().toMap
    val sig = sh.map { case (id, s) =>
      id -> (0 until 16).map(i => s.map(x => md5hex(s"$i:$x")).min)
    }
    def jac(a: Seq[String], b: Seq[String]) = {
      val (sa, sb) = (a.toSet, b.toSet)
      math.floor(sa.intersect(sb).size * 1000000.0 / sa.union(sb).size).toLong
    }
    val want = configs.map { case (b, r) =>
      val keys = sig.map { case (id, sg) =>
        id -> (0 until b).map(j => s"$j|" + sg.slice(j * r, j * r + r).mkString(","))
      }
      val ids = sig.keys.toSeq.sorted
      val cand = for {
        i <- ids; j <- ids if i < j
        if keys(i).intersect(keys(j)).nonEmpty
      } yield (i, j)
      val nv = cand.count { case (i, j) => jac(sh(i), sh(j)) >= 600000L }
      (b.toLong, r.toLong, cand.size.toLong, nv.toLong,
        if (cand.nonEmpty) Some(nv * 1000000L / cand.size) else None)
    }
    assert(got == want, s"got=$got want=$want")
    // a shared 4-row band implies both constituent 2-row bands: nesting
    val byR = got.map(g => g._2 -> g._3).toMap
    assert(byR(2L) >= byR(4L) && byR(4L) >= byR(8L), got.toString)
    // the planted dup pairs survive even the strictest config
    assert(got.last._4 >= 1L, got.toString)
  }

  test("prefixDupGroups: shared opening separates exact copies from near-dup candidates") {
    import graft.operators.Dedup
    val docs = Seq(
      (1L, "shared opening words then body one"),
      (2L, "shared opening words then body two"), // same prefix, different body
      (3L, "shared opening words then body one"), // exact copy of 1
      (4L, "a unique document entirely"),
      (5L, "another singleton text")).toDF("doc_id", "text")
    val got = Dedup.prefixDupGroups(docs, "doc_id", "text", prefixChars = 20)
      .as[(String, Long, Long, Long)].collect().toSeq
    // only the shared-prefix group (docs 1,2,3) collides: 3 docs, 2
    // distinct full texts, keeper 1; singletons filtered
    assert(got.size == 1, got.toString)
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest("shared opening words then body one".take(20).getBytes("UTF-8"))
      .map(b => f"${b & 0xFF}%02x").mkString
    assert(got.head == ((h, 3L, 2L, 1L)), got.head.toString)
  }
}
