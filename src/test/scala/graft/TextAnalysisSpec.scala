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
}
