package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, TextAnalysis}

class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "the cat sat on the mat, and it was happy!"),
    (1L, "le chat est dans la maison et il est content"),
    (2L, "xyzzy qwerty")
  ).toDF("id", "text").withColumn("_toks", TextAnalysis.tokens($"text"))

  test("token counts: whitespace and BPE-ish regex") {
    val r = docs.select($"id",
      TextAnalysis.tokenCount($"_toks").as("n"),
      TextAnalysis.bpeishTokenCount($"text").as("b"))
      .as[(Long, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    assert(r(0L)._1 == 10)
    // "the cat sat on the mat , and it was happy !" → 10 words + ',' + '!'
    assert(r(0L)._2 == 12)
    assert(r(2L) == ((2L, 2L)))
  }

  test("punctuation ratio in ppm") {
    val one = Seq(Tuple1("ab!?")).toDF("text")
    assert(one.select(TextAnalysis.punctRatioPpm($"text")).as[Long].head() == 500000L)
  }

  test("langId picks the language whose stopwords dominate; und when none hit") {
    val r = docs.select($"id", TextAnalysis.langId($"_toks").as("l"))
      .as[(Long, String)].collect().toMap
    assert(r(0L) == "en")
    assert(r(1L) == "fr")
    assert(r(2L) == "und")
  }

  test("stopword ratio and quality score bands") {
    val r = docs.select($"id",
      TextAnalysis.stopwordRatioPpm($"_toks").as("s"),
      TextAnalysis.qualityScorePpm($"text", $"_toks").as("q"))
      .as[(Long, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    // doc 0: "the" twice + "and" + "it" (en list) + "on"? not in list → 4/10
    assert(r(0L)._1 == 400000L)
    // doc 0: len 41 < 50 → no length points; stopwords ok; punct ok → 600000
    assert(r(0L)._2 == 600000L)
    // doc 2: no stopwords, short → only punct band
    assert(r(2L)._2 == 300000L)
  }

  test("tfidfTopTerms: rare term outranks common term; ties break by term") {
    // "zebra" appears once in doc 1 only (df=1); "common" is in all three
    // docs (df=3). tf equal ⇒ the rare term must score 3× higher.
    val corpus = Seq(
      (1L, "common zebra filler1 filler2"),
      (2L, "common fillerA fillerB fillerC"),
      (3L, "common fillerX fillerY fillerZ")).toDF("id", "text")
    val r = TextAnalysis.tfidfTopTerms(corpus, "id", "text", 2)
      .as[(Long, Long, String, Long)].collect()
      .groupBy(_._1).map { case (k, v) => k -> v.sortBy(_._2).map(x => (x._3, x._4)).toSeq }
    // doc 1: zebra tf=1 df=1 n=4 N=3 → floor(1e6·3/4) = 750000;
    //        common tf=1 df=3 → 250000; fillers df=1 tie with zebra →
    //        term order: filler1 < filler2 < zebra, so top-2 are fillers
    assert(r(1L) == Seq(("filler1", 750000L), ("filler2", 750000L)))
    // doc 2's top is its rarest alphabetically-first filler
    assert(r(2L).head == ("fillerA", 750000L))
    assert(r(2L).map(_._2).forall(_ > 0))
  }

  test("repetitionStats: repeated token/bigram fractions and distinct ratio") {
    val corpus = Seq(
      (1L, "spam spam spam spam"), // one token repeated 4× of 4
      (2L, "a b a b a b"),         // top tok 3/6, top bigram "a b" 3/5
      (3L, "solo")                 // single token: no bigram → 0
    ).toDF("id", "text")
    val r = TextAnalysis.repetitionStats(corpus, "id", "text")
      .as[(Long, Long, Long, Long)].collect().map(x => x._1 -> (x._2, x._3, x._4)).toMap
    assert(r(1L) == ((1000000L, 1000000L, 250000L)))
    assert(r(2L) == ((500000L, 600000L, 333333L)))
    assert(r(3L) == ((1000000L, 0L, 1000000L)))
  }

  test("stratifiedSampleFlag: per-stratum rates, default fallback, nested subsets") {
    val rows = (0L until 64L).map(i => (i, if (i % 2 == 0) "en" else "zh")).toDF("id", "lang")
    def kept(rates: Seq[(String, Int)], dflt: Int): Set[Long] =
      rows.filter(graft.operators.Sampling.stratifiedSampleFlag($"id", $"lang", rates, dflt))
        .select($"id").as[Long].collect().toSet
    val base = kept(Seq("en" -> 4, "zh" -> 16), 8)
    // zh at 16/16 keeps every zh row
    assert((1L until 64L by 2).forall(base.contains))
    // en at 4/16 keeps a strict, hash-determined subset
    val enKept = base.filter(_ % 2 == 0)
    assert(enKept.nonEmpty && enKept.size < 32)
    // raising en's rate only ADDS rows (nested subsets)
    val wider = kept(Seq("en" -> 8, "zh" -> 16), 8)
    assert(base.subsetOf(wider))
    // a stratum not in the rate map falls back to the default
    val dflt = kept(Seq("zh" -> 16), 4)
    assert(dflt.filter(_ % 2 == 0) == kept(Seq("en" -> 4, "zh" -> 16), 8).filter(_ % 2 == 0))
  }

  test("bigramLmScore: repeated transitions score high, unique ones split the mass") {
    // corpus: "a b" occurs 3x and is a's only transition → p(b|a)=1;
    // doc 3's "x" goes to two different successors → each p = 1/2
    val corpus = Seq(
      (1L, "a b"), (2L, "a b a b"), (3L, "x y x z"), (4L, "solo")).toDF("id", "text")
    val r = TextAnalysis.bigramLmScore(corpus, "id", "text")
      .as[(Long, Long, Long)].collect().map(x => x._1 -> (x._2, x._3)).toMap
    // doc 1: one bigram "a b": c2=3 ("a b" in docs 1,2,2... doc2="a b a b"
    // has bigrams: "a b","b a","a b" → c2("a b")=3, c1(a)=3 → t=1e6
    assert(r(1L) == ((1000000L, 1L)))
    // doc 3: "x y","y x","x z": p(y|x)=1/2, p(x|y)=1, p(z|x)=1/2
    // → mean = floor((500000+1000000+500000)/3) = 666666
    assert(r(3L) == ((666666L, 3L)))
    assert(!r.contains(4L)) // single token: no bigram
  }

  test("dsirImportance: target-domain contrast, unseen bigrams carry 0 target mass") {
    val corpus = Seq(
      (1L, "a b a b", "en"),
      (2L, "a b c", "fr"),
      (3L, "c", "en") // single token: no feature, drops out
    ).toDF("id", "text", "lang")
    val r = TextAnalysis.dsirImportance(corpus, "id", "text", $"lang" === "en")
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(x => x._1 -> (x._2, x._3, x._4, x._5)).toMap
    // target model (doc 1 only): c2t("a b")=2,("b a")=1; c1t(a)=2,(b)=1
    // source model (docs 1+2):   c2s("a b")=3,("b a")=1,("b c")=1; c1s(a)=3,(b)=2
    // doc 1: tt = (1e6, 1e6, 1e6) → 1e6; ts = (1e6, 5e5, 1e6) → 833333
    assert(r(1L) == ((3L, 1000000L, 833333L, 166667L)))
    // doc 2: "b c" unseen by target → tt 0; ts("b c") = 1e6/2
    // tt = (1e6, 0) → 5e5; ts = (1e6, 5e5) → 750000
    assert(r(2L) == ((2L, 500000L, 750000L, -250000L)))
    assert(!r.contains(3L))
  }

  test("PII scrub: emails then digit runs, no double counting") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@sub.example.org or 12345678 now"),
      (2L, "digits 123456 only six"), // < 7: kept
      (3L, "user9876543@host.io")     // digits inside the email
    ).toDF("id", "text")
      .withColumn("_e", TextAnalysis.emailScrub($"text"))
      .select($"id", TextAnalysis.digitScrub($"_e").as("clean"),
        TextAnalysis.patternCount($"text", TextAnalysis.emailPattern).as("ne"),
        TextAnalysis.patternCount($"_e", TextAnalysis.longDigitPattern).as("nd"))
      .as[(Long, String, Long, Long)].collect().map(x => x._1 -> (x._2, x._3, x._4)).toMap
    assert(df(1L) == (("mail me at <EMAIL> or <NUM> now", 1L, 1L)))
    assert(df(2L) == (("digits 123456 only six", 0L, 0L)))
    // the digit run vanished WITH the email — not double-counted
    assert(df(3L) == (("<EMAIL>", 1L, 0L)))
  }

  test("fingerprintFrame: distinct shingle count and stable min/max md5") {
    val fp = TextAnalysis.fingerprintFrame(
      Seq((1L, "a b c d"), (2L, "a b c d")).toDF("id", "text")
        .withColumn("_toks", split($"text", " ")),
      "id", Dedup.tokenShingles($"_toks", 3))
    val rows = fp.select($"id", $"n_shingles", $"fp_min", $"fp_max")
      .as[(Long, Long, String, String)].collect().toSeq.sortBy(_._1)
    assert(rows.map(_._2) == Seq(2L, 2L))
    assert(rows(0)._3 == rows(1)._3 && rows(0)._4 == rows(1)._4) // same text → same fp
    assert(rows(0)._3 <= rows(0)._4)
  }

  test("bm25TopK: tf raises, length lowers, rarity raises the score") {
    val pad = (1 to 20).map(i => s"pad$i").mkString(" ")
    val docs = Seq(
      (1L, s"apple $pad"),                 // tf=1, short
      (2L, s"apple apple apple $pad"),     // tf=3, short → beats doc 1
      (3L, s"apple $pad $pad $pad"),       // tf=1, long  → below doc 1
      (4L, s"zebra $pad"),                 // rare term (df=1) → beats apple docs
      (5L, s"apple zebra-absent $pad")     // filler so apple df=4
    ).toDF("doc_id", "text")
    val r = graft.operators.TextAnalysis
      .bm25TopK(docs, "doc_id", "text", Seq("apple", "zebra"), k = 5)
      .as[(Long, Long)].collect().toMap
    assert(r(2L) > r(1L), s"higher tf must raise the score: $r")
    assert(r(1L) > r(3L), s"longer doc must be normalized down: $r")
    assert(r(4L) > r(2L), s"rare term (df=1) must outscore common (df=4): $r")
  }

  test("extractHtmlText strips script/style/tags, decodes entities, filters lines") {
    val html = "<html><head><title>My Page</title><style>p{color:red}</style>" +
      "<script>var a = \"</p>\";</script></head><body>" +
      "<h1>Short head</h1>" +
      "<p>this paragraph has well over six whole tokens &amp; an entity</p>" +
      "<div>nav menu</div>" +
      "<p>x &lt;tag&gt; y keeps going with more than six tokens</p></body></html>"
    val r = Seq((1L, html)).toDF("id", "h")
      .select(graft.operators.TextAnalysis.extractHtmlText($"h", 6).as("e"))
      .select($"e.text", $"e.n_lines", $"e.n_kept")
      .as[(String, Long, Long)].head()
    val lines = r._1.split("\n").toSeq
    assert(lines == Seq(
      "this paragraph has well over six whole tokens & an entity",
      "x <tag> y keeps going with more than six tokens"), lines.toString)
    assert(!r._1.contains("var a"), "script body leaked")
    assert(!r._1.contains("color"), "style body leaked")
    assert(r._2 >= 4 && r._3 == 2L, s"(n_lines, n_kept) = (${r._2}, ${r._3})")
  }

  test("canonicalUrl: fragment, case, www, tracking params, trailing slash") {
    def canon(u: String): String =
      Seq(Tuple1(u)).toDF("u").select(TextAnalysis.canonicalUrl($"u")).as[String].head()
    // every rule at once
    assert(canon("HTTPS://WWW.Ex3.COM/p/3?id=3&utm_source=feed&ref=42#frag")
      == "https://ex3.com/p/3?id=3")
    // tracking param first with others after, and as the only param
    assert(canon("http://a.com/x?utm_campaign=z&id=7") == "http://a.com/x?id=7")
    assert(canon("http://a.com/x?ref=9") == "http://a.com/x")
    // path case preserved; trailing slash stripped; no-query URL intact
    assert(canon("https://B.com/CaseD/") == "https://b.com/CaseD")
  }

  test("tagKeywords: per-tag hit census with 0-based first position") {
    val d = Seq(
      (1L, "slow query on a slow fast table"), // perf: slow@0, slow@4, fast table@5
      (2L, "fast"),                            // shorter than the 2-gram, no hits
      (3L, "stream batch window stream"),      // stream: stream@0,3 + batch window@1
      (4L, "agg")).toDF("doc_id", "text")      // exact single-token doc
    val got = TextAnalysis.tagKeywords(d, "doc_id", "text",
        Seq("perf" -> "slow", "perf" -> "fast table",
          "stream" -> "stream", "stream" -> "batch window", "sql" -> "agg"))
      .orderBy("doc_id", "tag")
      .as[(Long, String, Long, Long)].collect().toSeq
    assert(got == Seq(
      (1L, "perf", 3L, 0L),
      (3L, "stream", 3L, 0L),
      (4L, "sql", 1L, 0L)), got.toString)
  }

  test("rrfFuse: exact ppm scores, malformed runs can't inflate (ADVICE r6)") {
    def ppm(r: Long) = 1000000L / (60L + r)
    val run1 = Seq((10L, 1L), (20L, 2L), (30L, 3L)).toDF("id", "rank")
    // run2 is malformed: id 10 appears twice (ranks 5 and 2 — counts
    // once at 2), id 40 has rank −60 (zero divisor if kept), id 50 null
    val run2 = Seq((10L, Some(5L)), (10L, Some(2L)), (20L, Some(1L)),
      (40L, Some(-60L)), (50L, None: Option[Long])).toDF("id", "rank")
    val got = TextAnalysis.rrfFuse(Seq(run1, run2), "id", "rank", kRrf = 60, topK = 10)
      .as[(Long, Long, Long)].collect().toSeq
    val expect = Seq(
      (10L, 2L, ppm(1) + ppm(2)),
      (20L, 2L, ppm(2) + ppm(1)),
      (30L, 1L, ppm(3)))
      .sortBy { case (id, _, s) => (-s, id) }
    assert(got == expect, s"got=$got")
    assert(!got.exists(r => r._1 == 40L || r._1 == 50L))
  }

  test("logOddsTerms: exact cross-ratio, ranking equals float log-odds") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      ("en", "good good good common rare1"),
      ("en", "good common common"),
      ("de", "bad bad common common"),
      ("de", "bad common rare2"))
      .toDF("lang", "text")
    val got = TextAnalysis.logOddsTerms(docs, "text", col("lang") === "en")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // corpus: n1 = 8 en tokens, n2 = 7 de tokens, V = 5 terms
    // "good": y1=4, y2=0 → R = 5·(7+5-0-1) / ((8+5-4-1)·1) = 55/8
    assert(got("good") == ((4L, 0L, 55L * 1000000L / 8L)))
    // "bad": y1=0, y2=3 → R = 1·(7+5-3-1) / ((8+5-1)·4) = 8/48
    assert(got("bad") == ((0L, 3L, 8L * 1000000L / 48L)))
    // near-balanced term: "common" y1=3, y2=3 → R = 4·8/(9·4) = 8/9
    assert(got("common") == ((3L, 3L, 8L * 1000000L / 9L)))
    // ranking by ratio_ppm must equal ranking by the float log-odds δ
    def delta(y1: Long, y2: Long): Double = {
      val (n1, n2, v) = (8.0, 7.0, 5.0)
      math.log((y1 + 1) / (n1 + v - y1 - 1)) - math.log((y2 + 1) / (n2 + v - y2 - 1))
    }
    val byRatio = got.toSeq.sortBy { case (t, (_, _, r)) => (-r, t) }.map(_._1)
    val byDelta = got.toSeq.sortBy { case (t, (y1, y2, _)) => (-delta(y1, y2), t) }.map(_._1)
    assert(byRatio == byDelta, s"ratio=$byRatio delta=$byDelta")
    // directionality: en-leaning > 10⁶ > de-leaning
    assert(got("good")._3 > 1000000L && got("bad")._3 < 1000000L)
    assert(got("rare1")._3 > 1000000L && got("rare2")._3 < 1000000L)
  }

  test("collocations equals brute PMI cross-ratio ranking with support floor") {
    val texts = Seq(
      "new york is big", "new york city", "san francisco fog",
      "san francisco bay", "the city the fog the bay", "is the city big")
    val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val got = TextAnalysis.collocations(docs, "doc_id", "text", minCount = 2L, k = 5)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // brute model
    val toks = texts.flatMap(_.split(" "))
    val bis = texts.flatMap(t => t.split(" ").sliding(2).filter(_.length == 2)
      .map(_.mkString(" ")))
    val c1 = toks.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val c2 = bis.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter(_._2 >= 2L)
    val n = toks.size.toLong
    val want = c2.toSeq.map { case (bg, n12) =>
      val Array(w1, w2) = bg.split(" ")
      (bg, n12, c1(w1), c1(w2),
        (BigInt(n12) * n * 1000000 / (BigInt(c1(w1)) * c1(w2))).toLong)
    }.sortBy(r => (-r._5, r._1)).take(5)
    assert(got == want, s"got=$got want=$want")
  }

  test("stupidBackoffScore: hand-computed cascade over a tiny train/eval split") {
    // train (id 0): trigrams {a b c, b c a, c a b, a b d};
    // bigrams {a b:2, b c, c a, b d}; unigrams {a:2, b:2, c, d}; N=6.
    // eval (id 1) "a b c x b d":
    //   "a b c" seen      → 10⁶·1/2        = 500000 (lvl 3)
    //   "b c x" all-unseen → 0             (lvl 0)
    //   "c x b" uni "b"   → 2·160000/6    = 53333  (lvl 1)
    //   "x b d" bi "b d"  → 1·400000/2    = 200000 (lvl 2)
    // mean = floor(753333/4) = 188333
    val docs = Seq((0L, "a b c a b d"), (1L, "a b c x b d"), (3L, "a b"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.stupidBackoffScore(docs, "doc_id", "text",
        col("doc_id") % 2 === 0)
      .as[(Long, Long, Long, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // doc 3 (eval, 2 tokens) has no trigram and drops out; train docs
    // are never scored
    assert(got.keySet == Set(1L), got.toString)
    assert(got(1L) == ((1L, 4L, 188333L, 1L, 1L, 1L)), got.toString)
  }

  test("chi2Terms: hand-computed 2x2 contingencies, all-doc term dropped") {
    val docs = Seq(
      (1L, "a b z", "en"), (2L, "a c z", "en"),
      (3L, "b c z", "fr"), (4L, "c d z", "fr"))
      .toDF("doc_id", "text", "lang")
    val got = TextAnalysis.chi2Terms(docs, "text", col("lang") === "en", topK = 10)
      .as[(String, Long, Long, Long)].collect()
    val m = got.map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // a: df1=2 df2=0 -> chi2 = 4*(2*2)^2/(2*2*2*2) = 4 exactly
    assert(m("a") == ((2L, 0L, 4000000L)), m.toString)
    assert(m("d") == ((0L, 1L, 1333333L)), m.toString)
    // c: a=1 b=2 c=1 d=0 -> 4*(1*0-2*1)^2/(3*1*2*2) = 16/12
    assert(m("c") == ((1L, 2L, 1333333L)), m.toString)
    // z appears in EVERY doc -> c+d = 0 -> undefined, dropped not scored 0
    assert(!m.contains("z"), m.toString)
    // ranking: perfect separator first; ties by term
    assert(got.head._1 == "a", got.map(_._1).mkString(","))
  }

  test("chi2Terms: doc-frequency semantics (repeats in one doc count once)") {
    val docs = Seq(
      (1L, "a a a a b", "en"), (2L, "b x", "fr"))
      .toDF("doc_id", "text", "lang")
    val m = TextAnalysis.chi2Terms(docs, "text", col("lang") === "en", topK = 10)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(m("a") == ((1L, 0L)), m.toString) // df, not token count 4
  }

  test("chi2Terms equals BigInt brute replay on a random corpus") {
    val rnd = new scala.util.Random(77)
    val vocab = Vector("w0", "w1", "w2", "w3", "w4", "w5", "w6", "w7")
    val docs = (1 to 60).map { i =>
      val cls = if (i % 3 == 0) "en" else "de"
      // class-biased draw so chi2 has signal
      val toks = (0 until 6 + rnd.nextInt(5)).map { _ =>
        if (cls == "en") vocab(rnd.nextInt(5)) else vocab(3 + rnd.nextInt(5))
      }
      (i.toLong, toks.mkString(" "), cls)
    }
    val df = docs.toDF("doc_id", "text", "lang")
    val got = TextAnalysis.chi2Terms(df, "text", col("lang") === "en", topK = 100)
      .as[(String, Long, Long, Long)].collect().toVector
    val n1 = docs.count(_._3 == "en").toLong
    val n2 = docs.size - n1
    val brute = vocab.flatMap { t =>
      val df1 = docs.count(d => d._3 == "en" && d._2.split(" ").contains(t)).toLong
      val df2 = docs.count(d => d._3 != "en" && d._2.split(" ").contains(t)).toLong
      val cd = n1 - df1 + n2 - df2
      if (df1 + df2 > 0 && cd > 0 && n1 > 0 && n2 > 0) {
        val diff = BigInt(df1) * (n2 - df2) - BigInt(df2) * (n1 - df1)
        val chi2 = BigInt(n1 + n2) * diff * diff * 1000000 /
          (BigInt(df1 + df2) * cd * n1 * n2)
        Some((t, df1, df2, chi2.toLong))
      } else None
    }.sortBy(r => (-r._4, r._1))
    assert(got == brute, s"got=${got.take(3)} brute=${brute.take(3)}")
  }

  test("vocabGrowth: hand-traced novelty curve, single-token docs excluded") {
    val docs = Seq(
      (0L, "a b c"),     // batch 0: bigrams {a b, b c} — 2 occ, 2 new
      (1L, "a b a"),     // batch 1: {a b, b a} — 2 occ, 1 new (b a)
      (2L, "a b"),       // batch 2: {a b} — 1 occ, 0 new
      (2L, "x"))         // single token: no bigram, occ unchanged
      .toDF("batch", "text")
    val got = TextAnalysis.vocabGrowth(docs, col("batch"), "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == Seq(
      (0L, 2L, 2L, 2L, 1000000L),
      (1L, 2L, 1L, 3L, 500000L),
      (2L, 1L, 0L, 3L, 0L)), got.toString)
  }

  test("vocabGrowth equals brute first-occurrence replay on a random corpus") {
    val rnd = new scala.util.Random(97)
    val vocab = Vector("p", "q", "r", "s", "t")
    val docs = (1 to 80).map { i =>
      (i.toLong % 5,
        (0 until 2 + rnd.nextInt(6)).map(_ => vocab(rnd.nextInt(5))).mkString(" "))
    }
    val got = TextAnalysis.vocabGrowth(docs.toDF("b", "text"), col("b"), "text")
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    def bgs(t: String): Seq[String] = {
      val w = t.split(" ").toSeq
      if (w.size < 2) Seq.empty else w.sliding(2).map(_.mkString(" ")).toSeq
    }
    val all = docs.flatMap { case (b, t) => bgs(t).map(b -> _) }
    val firstB = all.groupBy(_._2).view.mapValues(_.map(_._1).min).toMap
    val batches = all.map(_._1).distinct.sorted
    val brute = batches.map { b =>
      val occ = all.count(_._1 == b).toLong
      val nNew = firstB.count(_._2 == b).toLong
      val cum = firstB.count(_._2 <= b).toLong
      (b, occ, nNew, cum, if (occ > 0) nNew * 1000000L / occ else 0L)
    }
    assert(got == brute, s"got=$got brute=$brute")
  }

  test("readability counts: vowel-run syllables, terminal-run sentences, FK floors") {
    val rows = Seq(
      (1L, "the cat sat. it ran!"),   // 5 words, 2 sents, 5 vowel runs
      (2L, "wait... what?!"),         // 2 words, 2 sents ("..." and "?!")
      (3L, "no terminator here")      // floor at 1 sentence
    ).toDF("doc_id", "text")
    val got = rows.select(col("doc_id"),
        TextAnalysis.tokenCount(TextAnalysis.tokens(col("text"))).as("w"),
        TextAnalysis.sentenceCount(col("text")).as("s"),
        TextAnalysis.syllableCountish(col("text")).as("sy"))
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(got(1L) == ((5L, 2L, 5L)), got.toString)   // e, a, a, i, a
    assert(got(2L) == ((2L, 2L, 2L)), got.toString)   // "ai" (one run), "a"
    assert(got(3L) == ((3L, 1L, 7L)), got.toString)
    // FK milli-grade replays the two independent floors
    val fk = rows.filter(col("doc_id") === 1L)
      .select(TextAnalysis.fkGradeMilli(lit(5L), lit(2L), lit(5L)))
      .as[Long].collect().head
    assert(fk == 390L * 5 / 2 + 11800L * 5 / 5 - 15590L, fk.toString) // 975+11800-15590
  }

  test("featureHashStats: census conserves tokens and distinct terms") {
    val docs = Seq((1L, "aa bb aa cc"), (2L, "bb dd aa")).toDF("doc_id", "text")
    val got = TextAnalysis.featureHashStats(docs, "text", buckets = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum == 7L, got.mkString(","))   // 7 token occurrences
    assert(got.map(_._3).sum == 4L, got.mkString(","))   // 4 distinct terms
    assert(got.forall(r => r._1 >= 0 && r._1 < 4), got.mkString(","))
    // dominant-share: a bucket holding exactly one term reports 1e6
    assert(got.filter(_._3 == 1L).forall(_._4 == 1000000L), got.mkString(","))
    // deterministic across runs (hash is md5, not JVM hashCode)
    val again = TextAnalysis.featureHashStats(docs, "text", buckets = 4)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
  }

  test("rakePhrases: hand-scored deg/freq, stopword+punct splitting, top order") {
    // phrases: "big good cat" | "bad dog" | "good cat"
    // freq: big 1, good 2, cat 2, bad 1, dog 1
    // deg:  big 3, good 5, cat 5, bad 2, dog 2
    // scores ppm: big 3e6, good 2.5e6, cat 2.5e6, bad 2e6, dog 2e6
    // phrase: "big good cat" 8e6 > "good cat" 5e6 > "bad dog" 4e6
    val docs = Seq((1L, "big good cat the bad dog and good cat"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.rakePhrases(docs, "doc_id", "text", topK = 10)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("big good cat", 3L, 1L, 8000000L),
      ("good cat", 2L, 1L, 5000000L),
      ("bad dog", 2L, 1L, 4000000L)), got.toString)
    // punctuation-bearing tokens split phrases like stopwords do
    val p = Seq((1L, "good cat. bad dog")).toDF("doc_id", "text")
    val gp = TextAnalysis.rakePhrases(p, "doc_id", "text", topK = 10)
      .as[(String, Long, Long, Long)].collect().map(_._1).toSet
    assert(gp == Set("good", "bad dog"), gp.toString) // "cat." is a delimiter
  }

  test("hapaxCensus: brute per-group frequency replay") {
    val docs = Seq(
      (1L, "en", "a b a c"), (2L, "en", "a d  e"), // double space → empty token dropped
      (3L, "fr", "x x x")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.hapaxCensus(docs, $"lang", "text")
      .orderBy("g").as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    // en: tokens a,b,a,c,a,d,e = 7; vocab {a,b,c,d,e} = 5; hapax {b,c,d,e} = 4
    // fr: tokens 3; vocab 1; hapax 0
    assert(got == Seq(
      ("en", 7L, 5L, 4L, 5000000L / 7, 4000000L / 5),
      ("fr", 3L, 1L, 0L, 1000000L / 3, 0L)), got.toString)
  }

  test("zipfFit: class-range bucketing equals the naive per-term ranking") {
    // skewed corpus: term frequencies 8,4,4,2,1,1,1,1 (9 terms incl ties)
    val text = (Seq.fill(8)("t0") ++ Seq.fill(4)("t1") ++ Seq.fill(4)("t2") ++
      Seq.fill(2)("t3") ++ Seq("t4", "t5", "t6", "t7")).mkString(" ")
    val docs = Seq((1L, "en", text), (2L, "de", "x y y")).toDF("doc_id", "lang", "text")
    val got = TextAnalysis.zipfFit(docs, $"lang", "text")
      .orderBy("g").as[(String, Long, Long, Long, Long, Long, Long)].collect().toSeq
    def ilog2(n: Long) = 63 - java.lang.Long.numberOfLeadingZeros(n)
    def naive(freqs: Seq[Long]) = {
      val ranked = freqs.sorted(Ordering[Long].reverse).zipWithIndex
        .map { case (f, i) => (ilog2(i + 1L), ilog2(f)) }
      val n = ranked.size.toLong
      val sx = ranked.map(_._1.toLong).sum; val sy = ranked.map(_._2.toLong).sum
      val sxy = ranked.map(r => r._1.toLong * r._2).sum
      val sxx = ranked.map(r => r._1.toLong * r._1).sum
      val den = n * sxx - sx * sx
      (n, sx, sy, sxy, sxx, if (den != 0) (n * sxy - sx * sy) * 1000000L / den else Long.MinValue)
    }
    val en = naive(Seq(8L, 4L, 4L, 2L, 1L, 1L, 1L, 1L))
    // de "x y y": ranks (1,f=2),(2,f=1) → (x,y) = (0,1),(1,0):
    // sx=1 sy=1 sxy=0 sxx=1 → slope = (2·0 − 1·1)·1e6 ÷ (2·1 − 1) = −1e6
    assert(got.head == (("de", 2L, 1L, 1L, 0L, 1L, -1000000L)), got.head.toString)
    assert(got(1) == (("en", en._1, en._2, en._3, en._4, en._5, en._6)), got(1).toString)
    // slope for a Zipf-ish tail is negative and near −1e6 ppm
    assert(en._6 < 0, s"slope ${en._6}")
  }
}
